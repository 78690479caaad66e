package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed joins must eliminate the exchange: the one-time write-side
  * shuffle replaces the per-query one. Asserted on the physical plan, not
  * timings — the property is structural.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans with no shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val orders = (1L to 1000L).map(i => (i, i % 97, s"o$i"))
        .toDF("okey", "cust", "note")
      val items = (1L to 5000L).map(i => (i % 1000 + 1, i, (i % 50).toDouble))
        .toDF("okey", "item", "qty")
      Bucketing.writeBucketed(orders, "b_orders", "okey", 8)
      Bucketing.writeBucketed(items, "b_items", "okey", 8)

      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_items", "okey")
      val n = joined.count()
      assert(n === 5000L) // every item matches exactly one order

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      // aggregation on the bucket key also skips the exchange
      val agg = spark.table("b_items").groupBy($"okey").agg(sum($"qty"))
      agg.count()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"bucketed aggregation must not shuffle:\n$aggPlan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }

  test("partitioned layout prunes non-matching directories at scan time") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-partitioned").toString
    val events = graft.GraftSession
      .table(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", $"event_type", $"value")
    Bucketing.writePartitioned(events, path, "event_type")

    val filtered = spark.read.parquet(path)
      .filter($"event_type" === "purchase")
    val expected = events.filter($"event_type" === "purchase").count()
    assert(filtered.count() === expected)

    // the filter must land in PartitionFilters (directory pruning), not
    // as a post-scan data filter over every file
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains("event_type#") && scan.contains("purchase"), scan)
    val pf = scan.split("PartitionFilters: \\[")(1)
    assert(pf.takeWhile(_ != ']').contains("purchase"),
      s"partition filter must carry the predicate:\n$scan")

    // one directory per distinct value on disk
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("event_type=purchase")), dirs)
  }
}
