package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of the KMV theta sketch (no DuckDB oracle — the sketch is
  * engine-specific, so the bounds ARE the contract): sparse-mode
  * exactness, the (k−1)/u_k error envelope, partition invariance, and
  * intersection estimation against exact overlap.
  */
class KmvSpec extends SparkSpec {

  private val K = KmvSketch.DefaultK

  test("sparse mode is exact: fewer than k distinct values => sketch = set") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = (1 to 100).flatMap(i => Seq(i, i)).toDF("v") // dups collapse
      .select(expr("graft_kmv(xxhash64(v))").as("sk"))
    val row = df.select(size(col("sk")).as("n")).collect().head
    assert(row.getInt(0) === 100)
  }

  test("estimate stays within 5 sigma of exact at 50k distinct") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val n = 50000
    val est = (1 to n).toDF("v")
      .select(expr("graft_kmv(xxhash64(v))").as("sk"))
      .select(
        (lit((K - 1).toDouble) /
          ((element_at(col("sk"), K).cast("double") -
            lit(Long.MinValue.toDouble)) / lit(math.pow(2, 64)))).as("est"))
      .collect().head.getDouble(0)
    // rsd ~ 1/sqrt(k-2) ~ 6.3%; 5 sigma ~ 31%
    assert(math.abs(est - n) / n < 0.31, s"est=$est exact=$n")
  }

  test("sketch is invariant to partitioning (exact merge semantics)") {
    VectorFunctions.register(spark)
    import spark.implicits._
    def sketchOf(parts: Int): Seq[Long] = (1 to 20000).toDF("v")
      .repartition(parts)
      .select(expr("graft_kmv(xxhash64(v))").as("sk"))
      .collect().head.getSeq[Long](0)
    assert(sketchOf(1) === sketchOf(13))
  }

  test("intersection estimate tracks exact overlap of two cohorts") {
    VectorFunctions.register(spark)
    import spark.implicits._
    // A = [1, 30000], B = [20001, 50000] -> overlap 10000
    val a = (1 to 30000).toDF("v").select(lit("a").as("g"), col("v"))
    val b = (20001 to 50000).toDF("v").select(lit("b").as("g"), col("v"))
    val sk = a.union(b).groupBy(col("g"))
      .agg(expr("graft_kmv(xxhash64(v))").as("sk"))
    def theta(c: org.apache.spark.sql.Column) =
      when(size(c) < K, lit(1.0))
        .otherwise((element_at(c, K).cast("double") -
          lit(Long.MinValue.toDouble)) / lit(math.pow(2, 64)))
    val j = sk.filter(col("g") === "a").select(col("sk").as("ska"))
      .crossJoin(sk.filter(col("g") === "b").select(col("sk").as("skb")))
      .withColumn("common", expr("graft_sorted_and_count(ska, skb)"))
      .withColumn("theta", least(theta(col("ska")), theta(col("skb"))))
      .select((col("common") / col("theta")).as("est"))
      .collect().head.getDouble(0)
    // overlap estimator variance is higher than the plain estimate;
    // 10k true overlap, accept +/- 50%
    assert(math.abs(j - 10000.0) / 10000.0 < 0.5, s"est=$j exact=10000")
  }

  /** The EXACT DuckDB oracles of `q_cohort_overlap` and
    * `q_approx_distinct` are only valid while every sketch stays in
    * SPARSE mode (distincts < k). This pins that assumption with a ≥2×
    * margin so a future SF bump fails HERE with a clear diagnostic
    * instead of as a mysterious hash mismatch in the driver gate.
    * Measured margins: events users/type ≤ 1 500 at sf0.1 vs k = 65 536;
    * lineitem distinct orderkeys/flag ≤ ~110 600 at sf0.1 vs k = 2²⁰.
    */
  test("oracled sketch queries stay in sparse mode with ≥2x margin (sf0.01)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val maxUsers = graft.GraftSession.table(spark, dir, "events")
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .agg(max($"n")).collect().head.getLong(0)
    assert(maxUsers * 2 < 65536,
      s"cohort sketches leaving sparse mode (max distinct users $maxUsers " +
        "vs k=65536): q_cohort_overlap's exact oracle no longer holds")
    val maxKeys = graft.GraftSession.table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"))
      .agg(max($"n")).collect().head.getLong(0)
    assert(maxKeys * 2 < graft.analytics.AdvancedQueries.ApproxDistinctK,
      s"distinct sketches leaving sparse mode (max distinct keys $maxKeys " +
        s"vs k=${graft.analytics.AdvancedQueries.ApproxDistinctK}): " +
        "q_approx_distinct's exact oracle no longer holds")
  }
}
