package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom MinHash aggregate must be exactly the fold `min(mix_p(h))`
  * per permutation — including across partial-aggregation merges, which
  * the DuckDB oracle can't see but a 1000-executor cluster exercises on
  * every query.
  */
class MinHashAggSpec extends SparkSpec {

  test("graft_minhash64 equals per-permutation min of the same mix") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = for {
      g <- 0 until 20
      _ <- 0 until 50
    } yield (g.toLong, rnd.nextLong())
    // force many partitions so partial buffers must merge
    val df = rows.toDF("g", "h").repartition(8)
    val agg = df.groupBy($"g").agg(expr("graft_minhash64(h)").as("sig"))
    val expected = df.groupBy($"g").agg(
      min(expr(MinHash64.mixSql("h", 0))).as("m0"),
      (1 until 64).map(p => min(expr(MinHash64.mixSql("h", p))).as(s"m$p")): _*)
    val got = agg.select($"g" +: (0 until 64).map(p =>
      element_at($"sig", p + 1).as(s"m$p")): _*)
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("graft_minhash64 ignores nulls and keeps 64-wide output") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (1L, None), (1L, Some(-3L)))
      .toDF("g", "h")
      .groupBy($"g").agg(expr("graft_minhash64(h)").as("sig"))
    val sig = df.select(size($"sig")).head().getInt(0)
    assert(sig === 64)
  }
}
