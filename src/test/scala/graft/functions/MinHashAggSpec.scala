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
    val got = df.groupBy($"g").agg(expr("graft_minhash64(h)").as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    // reference: per-group, per-permutation min of the same mix, in Scala
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> (0 until 64).map(p => rs.map(r => MinHash64.mix(r._2, p)).min)
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (g, sig) =>
      assert(got(g) === sig, s"group $g")
    }
  }

  test("permutations are pairwise distinct orderings (no linear aliasing)") {
    // regression for the GF(2)-linear mix: no two permutations may induce
    // the same ordering, nor differ by a constant XOR
    val probes = Array.tabulate(200)(i => MinHash64.mix(0L, 0) + i * 0x9E37L)
    for (p <- 0 until 64; q <- (p + 1) until 64) {
      val d0 = MinHash64.mix(probes(0), p) ^ MinHash64.mix(probes(0), q)
      val aliased = probes.forall(h =>
        (MinHash64.mix(h, p) ^ MinHash64.mix(h, q)) == d0)
      assert(!aliased, s"perms $p and $q differ by a constant XOR")
    }
  }

  test("graft_simhash32 equals the 32-column bit-majority construction") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- 0 until 15
      _ <- 0 until 40
    } yield (g.toLong, rnd.nextLong())
    // force partial-buffer merges across partitions
    val df = rows.toDF("g", "h").repartition(8)
    val got = df.groupBy($"g").agg(expr("graft_simhash32(h)").as("sim"))
      .as[(Long, Long)].collect().toMap
    // reference: the wide sum(CASE) + sign-pack construction, in Scala
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> (0 until 32).map { i =>
        val s = rs.map(r => if (((r._2 >>> i) & 1L) == 1L) 1 else -1).sum
        if (s > 0) 1L << i else 0L
      }.sum
    }
    assert(got === expected)
  }

  test("graft_minhash128 extends the same permutation stream") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, 42L), (1L, -7L)).toDF("g", "h")
      .groupBy($"g")
      .agg(expr("graft_minhash64(h)").as("s64"),
        expr("graft_minhash128(h)").as("s128"))
    val r = df.select($"s64", $"s128").head()
    val s64 = r.getSeq[Long](0); val s128 = r.getSeq[Long](1)
    assert(s128.length === 128)
    assert(s128.take(64) === s64,
      "first 64 slots must match graft_minhash64 (shared band layout)")
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
