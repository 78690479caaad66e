package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: the property that justifies it — per-file / per-bucket
  * 2-D bounding boxes are TIGHT, so box predicates prune most files by
  * min/max statistics. Measured against the single-column-sort layout the
  * z-order replaces, on the real lineitem table.
  */
class LayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Σ bucket box areas under a bucketing induced by `orderCols`. */
  private def totalBoxArea(orderCols: Seq[org.apache.spark.sql.Column]): Long = {
    import spark.implicits._
    val li = graft.GraftSession.table(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      .withColumn("zval", Layout.zValue($"l_partkey", $"l_suppkey"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(orderCols: _*)
    li.withColumn("bucket", ntile(64).over(w))
      .groupBy($"bucket")
      .agg(((max($"l_partkey") - min($"l_partkey") + 1) *
        (max($"l_suppkey") - min($"l_suppkey") + 1)).as("area"))
      .agg(sum($"area")).first().getLong(0)
  }

  test("z-order buckets cover a fraction of the single-sort box area") {
    import spark.implicits._
    val zArea = totalBoxArea(Seq($"zval", $"l_orderkey", $"l_linenumber"))
    // orderkey sort = the "natural" ingest order: partkey/suppkey spread
    // over every bucket, boxes cover ~the full domain each
    val naturalArea = totalBoxArea(Seq($"l_orderkey", $"l_linenumber"))
    assert(zArea * 4 < naturalArea,
      s"z-order area $zArea not < 1/4 of natural $naturalArea")
  }

  test("box predicate touches few z-ordered files, most natural files") {
    import spark.implicits._
    val li = graft.GraftSession.table(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", 32, s"$tmp/z")
    li.withColumn("zval", lit(0L)) // same schema, no clustering
      .repartition(32, $"l_orderkey")
      .write.parquet(s"$tmp/nat")
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter($"l_partkey".between(100, 140) && $"l_suppkey".between(5, 9))
        .select(input_file_name()).distinct().count()
    val zFiles = filesTouched(s"$tmp/z")
    val natFiles = filesTouched(s"$tmp/nat")
    // the box's matching rows concentrate in few z-files; hash layout
    // scatters them across essentially all files
    assert(zFiles * 3 <= natFiles,
      s"z layout touched $zFiles files vs natural $natFiles")
  }

  test("zorderWrite quantizes wide domains: clustering survives keys far " +
      "past 65535, where raw masking would alias") {
    import spark.implicits._
    // sf0.01 (partkey max 1999, suppkey max 99 — sf0.001's max of 199
    // would stay under 2^16 even scaled and pin nothing) scaled 137×:
    // partkey tops out at 273,863, so the raw 16-bit mask would wrap
    // keys ≥ 65,536 and scatter the box; the quantized write must not
    val li = graft.GraftSession.table(spark, "/root/testdata/sf0.01",
        "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        ($"l_partkey" * 137).as("l_partkey"), $"l_suppkey")
    val maxP = li.agg(max($"l_partkey")).first().getLong(0)
    assert(maxP > 65535L, s"test premise broken: max partkey $maxP fits " +
      "16 bits, the masking regression would not be exercised")
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout-w").toString
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", 32, s"$tmp/z")
    val zFiles = spark.read.parquet(s"$tmp/z")
      .filter($"l_partkey" <= maxP / 20 && $"l_suppkey" <= 9)
      .select(input_file_name()).distinct().count()
    assert(zFiles <= 8, s"wide-domain z layout scattered the box over " +
      s"$zFiles/32 files — quantization is not happening")
  }

  test("zorderWrite on an empty frame writes an empty dataset, not NPE") {
    import spark.implicits._
    val empty = graft.GraftSession.table(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      .filter($"l_partkey" < 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout-e").toString
    Layout.zorderWrite(empty, "l_partkey", "l_suppkey", 4, s"$tmp/z")
    assert(spark.read.parquet(s"$tmp/z").count() === 0L)
  }

  test("qZorderLayout on an empty table returns an empty layout frame, " +
      "not NPE on the null bounds row") {
    import spark.implicits._
    // an empty lineitem parquet under a temp sfDir — the zero-row
    // partition/day an ingest job legitimately produces
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout-e2")
      .toString
    graft.GraftSession.table(spark, dir, "lineitem").limit(0)
      .write.parquet(s"$tmp/lineitem.parquet")
    val out = Layout.qZorderLayout(spark, tmp)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("bucket", "n_rows", "min_part",
      "max_part", "min_supp", "max_supp"),
      "empty-input schema must match the populated face's")
  }

  test("zValue interleave is exact on known bit patterns") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (43690L, 21845L)).toDF("a", "b")
      .select(Layout.zValue($"a", $"b").as("z")).collect().map(_.getLong(0))
    // a-bits land at odd positions, b-bits at even
    assert(rows(0) === 0L)
    assert(rows(1) === 2L)
    assert(rows(2) === 1L)
    assert(rows(3) === 2863311530L) // 0xAAAAAAAA
    assert(rows(4) === 1431655765L) // 0x55555555
    // a=0b1010...1010 (0xAAAA), b=0b0101...0101 (0x5555):
    // odd positions get a's bits, even get b's
    val expected = (0 until 16).map { i =>
      val aBit = (43690L >> i) & 1L
      val bBit = (21845L >> i) & 1L
      (aBit << (2 * i + 1)) | (bBit << (2 * i))
    }.sum
    assert(rows(5) === expected)
  }
}
