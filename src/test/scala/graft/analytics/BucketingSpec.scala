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

  test("z-order layout keeps per-file min/max narrow in BOTH dimensions") {
    import spark.implicits._
    // 64×64 uniform grid: every (a, b) pair once — the layout, not the
    // data distribution, determines the per-file stats
    val grid = (0 until 4096).map(i => (i.toLong % 64, i.toLong / 64))
      .toDF("a", "b")
    val zPath = java.nio.file.Files.createTempDirectory("graft-z").toString
    val linPath = java.nio.file.Files.createTempDirectory("graft-lin").toString
    Bucketing.writeZOrdered(grid, zPath, "a", "b", bits = 6, numFiles = 16)
    grid.repartitionByRange(16, $"a").sortWithinPartitions($"a")
      .write.mode("overwrite").parquet(linPath)

    // same rows in both layouts
    assert(spark.read.parquet(zPath).count() === 4096L)

    val zA = Bucketing.fileCoverage(spark, zPath, "a")
    val zB = Bucketing.fileCoverage(spark, zPath, "b")
    val linA = Bucketing.fileCoverage(spark, linPath, "a")
    val linB = Bucketing.fileCoverage(spark, linPath, "b")
    // single-column sort: perfect on a, hopeless on b (each file spans the
    // whole b domain — no skipping possible for b predicates)
    assert(linA < 0.2, s"linear layout should be tight on a: $linA")
    assert(linB > 0.8, s"linear layout must span b: $linB")
    // z-order: 16 contiguous Morton ranges of a 64×64 grid ≈ 16×16 tiles —
    // BOTH dims stay near √(1/16) = 0.25 of the domain (range-partitioner
    // sampling can smear boundaries; 0.5 is still 2× better than linear)
    assert(zA < 0.5 && zB < 0.5,
      s"z-order must bound both dims: a=$zA b=$zB")
  }

  test("compaction collapses small files to the byte-sized target, rows intact") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft-tiny").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // 64 tiny files
    (1L to 6400L).map(i => (i, s"row$i")).toDF("id", "s")
      .repartition(64).write.mode("overwrite").parquet(in)
    val inFiles = new java.io.File(in).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(inFiles === 64)
    val totalBytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // target = half the total → expect exactly 2 output files
    val n = Bucketing.compact(spark, in, out, targetBytes = totalBytes / 2 + 1)
    assert(n === 2, s"expected 2 target files, got $n")
    val outFiles = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles === n)
    // contents preserved exactly
    assert(spark.read.parquet(out).count() === 6400L)
    assert(spark.read.parquet(out).agg(sum($"id")).first().getLong(0) ===
      (6400L * 6401L) / 2)
  }

  test("compaction sizes from nested files: hive layout bytes are seen recursively") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft-nested").toString
    val out = java.nio.file.Files.createTempDirectory("graft-nested-out").toString
    // hive-partitioned layout: data files live in k=…/ subdirectories, so a
    // TOP-LEVEL listing sees 0 parquet bytes and would size the rewrite to
    // the max(1, …) floor of one file regardless of input size
    (1L to 6400L).map(i => (i, i % 4, s"row$i")).toDF("id", "k", "s")
      .repartition(16).write.partitionBy("k").mode("overwrite").parquet(in)
    assert(new java.io.File(in).listFiles()
      .count(_.getName.endsWith(".parquet")) === 0, "layout must be nested")
    val nestedBytes = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(in))
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    // target = half the nested byte total → 2 files ONLY if the listing
    // descended into the partition directories
    val n = Bucketing.compact(spark, in, out, targetBytes = nestedBytes / 2 + 1)
    assert(n === 2, s"recursive listing must see nested bytes, got $n files")
    assert(new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet")) === 2)
    // contents preserved, partition column rematerialized as a data column
    val back = spark.read.parquet(out)
    assert(back.count() === 6400L)
    assert(back.agg(sum($"id")).first().getLong(0) === (6400L * 6401L) / 2)
    assert(back.columns.toSet === Set("id", "k", "s"))
  }

  test("morton interleave round-trips bit positions") {
    import spark.implicits._
    val df = Seq((5L, 3L)).toDF("a", "b") // a=101₂, b=011₂
    // z = b2 a2 b1 a1 b0 a0 = 0 1 1 0 1 1 = 27
    val z = df.select(Bucketing.zOrderValue($"a", $"b", 3).as("z"))
      .collect().head.getLong(0)
    assert(z === 27L)
  }
}
