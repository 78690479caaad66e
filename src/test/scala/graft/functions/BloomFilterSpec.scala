package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom kernel contract: zero false negatives (the exactness guarantee
  * the pruned join relies on), a sane false-positive rate at the design
  * sizing, partial-merge (partitioning) invariance of the bitset, and
  * interpreted-vs-codegen agreement.
  */
class BloomFilterSpec extends SparkSpec {

  private def bitsOf(parts: Int): Array[Long] = {
    import spark.implicits._
    BloomFunctions.register(spark)
    (1L to 3000L).toDF("k").repartition(parts)
      .agg(expr("graft_bloom_agg(xxhash64(k), 65536, 3)").as("bits"))
      .first().getSeq[Long](0).toArray
  }

  test("no false negatives: every inserted key probes true") {
    import spark.implicits._
    BloomFunctions.register(spark)
    val bloom = (1L to 3000L).toDF("k")
      .agg(expr("graft_bloom_agg(xxhash64(k), 65536, 3)").as("bits"))
    val misses = (1L to 3000L).toDF("k")
      .crossJoin(broadcast(bloom))
      .filter(not(expr("graft_bloom_contains(bits, xxhash64(k), 3)")))
      .count()
    assert(misses === 0)
  }

  test("false-positive rate stays near the design point") {
    import spark.implicits._
    BloomFunctions.register(spark)
    val bloom = (1L to 3000L).toDF("k")
      .agg(expr("graft_bloom_agg(xxhash64(k), 65536, 3)").as("bits"))
    // theoretical fp ≈ (1 − e^(−3·3000/65536))³ ≈ 0.2%; allow 4×
    val fp = (100001L to 120000L).toDF("k")
      .crossJoin(broadcast(bloom))
      .filter(expr("graft_bloom_contains(bits, xxhash64(k), 3)"))
      .count()
    assert(fp < 20000 * 0.008, s"fp=$fp of 20000")
  }

  test("bitset is partitioning-invariant (OR-merge is exact)") {
    assert(bitsOf(1).toSeq === bitsOf(8).toSeq)
  }

  test("probe survives codegen and matches interpreted eval") {
    import spark.implicits._
    BloomFunctions.register(spark)
    val bloom = (1L to 500L).toDF("k")
      .agg(expr("graft_bloom_agg(xxhash64(k), 4096, 4)").as("bits"))
    val probes = (1L to 2000L).toDF("k").crossJoin(broadcast(bloom))
    val viaPlan = probes
      .filter(expr("graft_bloom_contains(bits, xxhash64(k), 4)"))
      .select($"k").collect().map(_.getLong(0)).toSet
    // interpreted reference: evaluate BloomKernel.contains on the driver
    val bits = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      bloom.first().getSeq[Long](0).toArray)
    val hashes = probes.select($"k", xxhash64($"k").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaEval = hashes.filter(kh => BloomKernel.contains(bits, kh._2, 4))
      .map(_._1).toSet
    assert(viaPlan === viaEval)
    assert((1L to 500L).toSet.subsetOf(viaPlan))
    val plan = probes
      .filter(expr("graft_bloom_contains(bits, xxhash64(k), 4)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"))
  }
}
