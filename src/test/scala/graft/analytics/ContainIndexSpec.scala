package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted containment-index contract: probing the durable artifact
  * with a delta equals the in-session incremental face — despite the
  * index ranking prefixes by FROZEN corpus df while the in-session query
  * ranks by live (corpus ∪ delta) df. That equality IS the
  * order-independence property of the prefix pigeonhole, exercised
  * end-to-end.
  */
class ContainIndexSpec extends SparkSpec with org.scalatest.BeforeAndAfterEach {

  // These tests pin the L0-accrual admission SHAPE, which the adaptive
  // cutover (IndexLayout.fanoutAppend) only selects past ~128 buckets —
  // force it so fixture-sized artifacts admit through L0 regardless
  override def beforeEach(): Unit = {
    super.beforeEach()
    spark.conf.set("spark.graft.index.l0.cutover", "0")
  }
  override def afterEach(): Unit = {
    spark.conf.unset("spark.graft.index.l0.cutover")
    super.afterEach()
  }


  private val dir = "/root/testdata/sf0.001"

  test("probe(artifact, delta) equals the in-session incremental answer") {
    import spark.implicits._
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files.createTempDirectory("graft-contain-idx")
      .toString
    ContainIndex.build(spark, docs.filter($"doc_id" % 5 =!= 4), idx)
    val fromDisk = ContainIndex
      .probe(spark, idx, docs.filter($"doc_id" % 5 === 4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inSession = DedupQueries.containmentIncrementalInSession(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inSession.nonEmpty,
      "sf0.001 must contain cross-delta containment pairs")
    assert(fromDisk === inSession)
  }

  test("probe-then-admit: an appended delta becomes corpus for the next " +
      "delta's probe, under the frozen df") {
    import spark.implicits._
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files.createTempDirectory("graft-contain-idx3")
      .toString
    ContainIndex.build(spark, docs.filter($"doc_id" % 5 < 3), idx)
    val day1 = docs.filter($"doc_id" % 5 === 3)
    val day2 = docs.filter($"doc_id" % 5 === 4)
    val before = ContainIndex.probe(spark, idx, day2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ContainIndex.append(spark, day1, idx, "day1"))
    val after = ContainIndex.probe(spark, idx, day2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.subsetOf(after), "admit lost previously-findable pairs")
    val viaDay1 = after -- before
    assert(viaDay1.nonEmpty,
      "admitting day 1 must expose day1-day2 containment pairs")
    val day1Ids = day1.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(viaDay1.forall(p =>
      day1Ids.contains(p._1) || day1Ids.contains(p._2)),
      s"new pairs must involve an admitted day-1 doc: $viaDay1")
    // at-least-once retry: the same deltaId is a no-op, multiset-stable
    assert(!ContainIndex.append(spark, day1, idx, "day1"))
    val retried = ContainIndex.probe(spark, idx, day2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(retried === after.toSeq.sorted,
      "retried admission changed the probe output")
  }

  test("re-probe after admission: no self-pairs, no per-copy duplicate " +
      "rows, cross-corpus answer kept") {
    import spark.implicits._
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files.createTempDirectory("graft-contain-idx4")
      .toString
    ContainIndex.build(spark, docs.filter($"doc_id" % 5 =!= 4), idx)
    val delta = docs.filter($"doc_id" % 5 === 4)
    val before = ContainIndex.probe(spark, idx, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ContainIndex.append(spark, delta, idx, "day1"))
    // after admission the delta's sets exist BOTH in the artifact and in
    // the probe's batch-local frame: without the doc_id dedupe each pair
    // would verify once per copy, and without the self filter every delta
    // doc would contain its own admitted copy at 1.0
    val again = ContainIndex.probe(spark, idx, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.forall(p => p._1 != p._2),
      "re-probe emitted self-pairs for already-admitted docs")
    assert(again.length === again.toSet.size,
      "re-probe emitted duplicate pair rows (per-copy verify)")
    assert(before.subsetOf(again.toSet),
      "re-probe lost genuine cross-corpus pairs")
  }

  test("compact: file count drops, probe multiset and applied deltas " +
      "unchanged") {
    import spark.implicits._
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files.createTempDirectory("graft-contain-idx5")
      .toString
    ContainIndex.build(spark, docs.filter($"doc_id" % 5 < 3), idx)
    assert(ContainIndex.append(spark, docs.filter($"doc_id" % 5 === 3), idx,
      "day1"))
    // two admissions: the bucket-granular fold's floor is base + merged
    // (2 files/bucket), so one accrual file per bucket cannot shrink
    assert(ContainIndex.append(spark,
      docs.filter($"doc_id" % 5 === 3)
        .select(($"doc_id" + 500000L).as("doc_id"), $"text"), idx, "day2"))
    val delta = docs.filter($"doc_id" % 5 === 4)
    val before = ContainIndex.probe(spark, idx, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    // TOTAL data files: bucketed base plus the L0 accrual subdir the
    // admissions write (underscore-hidden from table reads, but real
    // files compaction must count and consume)
    def files(t: String): Int = {
      def parts(d: java.io.File) =
        Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
          .count(f => f.isFile && f.getName.endsWith(".parquet"))
      val dir = new java.io.File(ContainIndex.tablePath(idx, t))
      parts(dir) + parts(new java.io.File(dir, "_l0"))
    }
    def l0Files(t: String): Int =
      Option(new java.io.File(ContainIndex.tablePath(idx, t), "_l0")
        .listFiles()).getOrElse(Array.empty[java.io.File])
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val filesBefore = files("tokens")
    assert(l0Files("tokens") > 0,
      "admissions must accrue as L0 files, not bucketed appends")
    assert(ContainIndex.compact(spark, idx, maxFiles = 1) > 0)
    assert(files("tokens") < filesBefore,
      s"compact did not shrink tokens: $filesBefore -> ${files("tokens")}")
    assert(l0Files("tokens") === 0 && l0Files("prefix") === 0,
      "compaction must fold the L0 accrual into the bucketed base")
    val after = ContainIndex.probe(spark, idx, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    assert(after === before, "compaction changed the probe multiset")
    assert(ContainIndex.appliedDeltas(idx) === Set("day1", "day2"))
  }

  test("prefix table is ~10% of the token table (the reason old-in-new " +
      "probes stay delta-sized)") {
    import spark.implicits._
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files.createTempDirectory("graft-contain-idx2")
      .toString
    ContainIndex.build(spark, docs, idx)
    val tokens = spark.read
      .parquet(ContainIndex.tablePath(idx, "tokens")).count()
    val prefix = spark.read
      .parquet(ContainIndex.tablePath(idx, "prefix")).count()
    assert(prefix * 5 < tokens, s"prefix $prefix not < 20% of tokens $tokens")
    assert(prefix > 0)
  }
}
