package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native kernel expressions vs. their higher-order-function reference
  * implementations — the kernels must be drop-in numerically identical
  * (same fold order) while staying inside whole-stage codegen.
  */
class VectorExpressionsSpec extends SparkSpec {

  test("graft_dot matches sequential-fold HOF on random vectors") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)(
      (Array.fill(64)(rnd.nextDouble()), Array.fill(64)(rnd.nextDouble())))
    val df = rows.toDF("a", "b")
      .select(
        expr("graft_dot(a, b)").as("kernel"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, x) -> s + x)")
          .as("hof"))
    // exact equality: both are ascending-index sequential folds
    assert(df.filter($"kernel" =!= $"hof").count() === 0)
  }

  test("graft_dot handles nulls and length mismatch") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0, 3.0)), Some(Array(4.0, 5.0))),
      (None: Option[Array[Double]], Some(Array(1.0)))
    ).toDF("a", "b").select(expr("graft_dot(a, b)").as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) === 1.0 * 4.0 + 2.0 * 5.0) // min-length loop
    assert(rows(1).isNullAt(0)) // null-safe
  }

  test("bitset kernels match bit_count semantics") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(0xFL, 0x0L), Array(0x3L, 0x1L)),
      (Array(-1L, -1L), Array(-1L, 0L)),
      (Array(0L), Array(0L))
    ).toDF("a", "b").select(
      expr("graft_bitset_count(a)").as("ca"),
      expr("graft_bitset_and_count(a, b)").as("inter"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows(0) === ((4L, 2L)))   // |a|=4; 0xF&0x3=0x3 (2 bits), 0x0&0x1=0
    assert(rows(1) === ((128L, 64L))) // two full words; intersect one word
    assert(rows(2) === ((0L, 0L)))
  }

  test("graft_poly_hash matches the HOF char fold") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq("hello world", "", "a", "Ünïcödé tëxt", "x" * 500)
      .toDF("s")
      .select(
        expr("graft_poly_hash(s)").as("kernel"),
        expr("aggregate(filter(split(s, ''), c -> c <> ''), 7L," +
          " (acc, c) -> (acc * 31 + ascii(c)) % 2147483647)").as("hof"))
    assert(df.filter($"kernel" =!= $"hof").count() === 0)
  }

  test("graft_cdc_bounds rolling hash matches the per-window re-fold") {
    VectorFunctions.register(spark)
    import spark.implicits._
    // varied strings incl. shorter-than-window, exactly-window, long
    val rnd = new scala.util.Random(7)
    val strs = Seq("", "short", "x" * 16) ++
      (0 until 50).map(_ => (0 until (20 + rnd.nextInt(400)))
        .map(i => ('a' + rnd.nextInt(26)).toChar).mkString)
    val df = strs.toDF("s").select(
      expr("graft_cdc_bounds(s)").as("kernel"),
      expr("""filter(
        |  transform(sequence(16, greatest(length(s), 16)),
        |    i -> if(i <= length(s) and
        |            graft_poly_hash(substring(s, i - 15, 16)) % 64 = 0,
        |            cast(i as bigint), -1L)),
        |  p -> p > 0)""".stripMargin).as("hof"))
    assert(df.filter(not($"kernel" <=> $"hof")).count() === 0,
      df.filter(not($"kernel" <=> $"hof")).collect().mkString("\n"))
  }

  test("probe kernel survives an all-NaN vector (deterministic fallback, no crash)") {
    // a NaN element poisons every centroid dot, leaving no distance
    // < Double.MaxValue; the kernel must fall back to the lowest untaken
    // ids (matching argmin's bestC=0 default), not crash on taken(-1)
    VectorFunctions.register(spark)
    import spark.implicits._
    val out = Seq(Array(Double.NaN, 1.0)).toDF("v")
      .select(expr(
        "graft_probe_dot(v, array(array(1.0D, 0.0D), array(0.0D, 1.0D), array(1.0D, 1.0D)), 2)")
        .as("probes"))
      .collect().head.getSeq[Int](0)
    assert(out === Seq(0, 1), s"NaN fallback must probe lowest ids, got $out")
  }

  test("kernels survive codegen (no fallback) in a realistic plan") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(100)(i => (i.toLong, Array.fill(32)(rnd.nextDouble())))
      .toDF("id", "v")
    val a = vecs.select($"id".as("ia"), $"v".as("va"))
    val b = vecs.select($"id".as("ib"), $"v".as("vb"))
    val joined = a.join(broadcast(b), $"ia" < $"ib")
      .select(expr("graft_dot(va, vb)").as("d"))
    // 100*99/2 pairs, all non-null
    assert(joined.filter($"d".isNotNull).count() === 4950)
    // the kernel appears inside a WholeStageCodegen span
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot"))
  }
}
