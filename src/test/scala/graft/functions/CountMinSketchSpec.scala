package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-min contract: the estimate NEVER under-counts (the property the
  * heavy-hitters pruning relies on), stays within the ε·N bound at the
  * design sizing, and the sketch is partitioning-invariant.
  */
class CountMinSketchSpec extends SparkSpec {

  // skewed multiset: value k appears k times, k = 1..200 (N = 20100)
  private def skewed = {
    import spark.implicits._
    (1 to 200).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
  }

  test("estimates never under-count and respect the eps*N bound") {
    import spark.implicits._
    CmsFunctions.register(spark)
    val sketch = skewed.agg(expr("graft_cms_agg(xxhash64(k), 4096, 4)").as("cms"))
    val est = skewed.distinct()
      .crossJoin(broadcast(sketch))
      .select($"k", expr("graft_cms_min(cms, xxhash64(k), 4)").as("est"))
    val joined = est.withColumn("truth", $"k") // value k appears k times
    assert(joined.filter($"est" < $"truth").count() === 0)
    // CMS bound: overestimate ≤ e·N/width with prob 1−e^−depth; allow the
    // loose deterministic check est ≤ truth + N/64
    assert(joined.filter($"est" > $"truth" + lit(20100L / 64)).count() === 0)
  }

  test("sketch is partitioning-invariant (sum-merge is exact)") {
    import spark.implicits._
    CmsFunctions.register(spark)
    def bits(parts: Int) = skewed.repartition(parts)
      .agg(expr("graft_cms_agg(xxhash64(k), 1024, 4)").as("cms"))
      .first().getSeq[Long](0)
    assert(bits(1) === bits(8))
  }

  test("probe survives codegen and matches interpreted eval") {
    import spark.implicits._
    CmsFunctions.register(spark)
    val sketch = skewed.agg(expr("graft_cms_agg(xxhash64(k), 1024, 3)").as("cms"))
    val probes = skewed.distinct().crossJoin(broadcast(sketch))
    val viaPlan = probes
      .select($"k", expr("graft_cms_min(cms, xxhash64(k), 3)").as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val counters = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sketch.first().getSeq[Long](0).toArray)
    val hashes = skewed.distinct().select($"k", xxhash64($"k").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    hashes.foreach { case (k, h) =>
      assert(viaPlan(k) === CmsKernel.estimate(counters, h, 3), s"k=$k")
    }
    val plan = probes
      .select(expr("graft_cms_min(cms, xxhash64(k), 3)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_cms_min"))
  }
}
