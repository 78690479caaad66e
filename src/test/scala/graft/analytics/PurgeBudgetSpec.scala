package graft.analytics

import java.io.File

import graft.SparkSpec

/** BUDGET-SLICED physical purge
  * ([[graft.streaming.VersionedArtifact.purgeVersionBudgeted]]) — the
  * r17-verdict #1 fix: an auto-purge of whole-rewrite tables (the
  * containment face's token-keyed `tokens`/`prefix`) must not stall the
  * maintenance seat for an O(corpus-table) pause. Pinned here:
  *
  *   1. SLICE BOUND — with budget = 1, every call commits one version
  *      rewriting the files of AT MOST ONE (table, bucket) slice;
  *      everything else hard-links.
  *   2. INVARIANT READS — probe output is identical after every slice
  *      (the sidecar stays until the final slice, so the logical filter
  *      covers whatever is not yet physically gone).
  *   3. NO REDONE WORK — the slice count equals the pending-slice count
  *      (`_purge.txt` progress carries across calls).
  *   4. COMPLETION — the final slice drops the sidecar and the progress
  *      marker; rows are physically gone from every doc-keyed table;
  *      `df` carried as links throughout (frozen-df contract).
  *   5. RESTART ON NEW TOMBSTONES — a delete admitted mid-purge changes
  *      the fingerprint; the purge restarts and BOTH tombstone sets are
  *      physically gone at completion.
  */
class PurgeBudgetSpec extends SparkSpec with org.scalatest.BeforeAndAfterEach {

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

  private def docs = {
    import spark.implicits._
    graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def currentVerDir(idx: String): File =
    new File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .maxBy(_.getName.stripPrefix("v").toLong)

  private def dataFiles(ver: File, t: String): Seq[File] = {
    def parts(d: File) = Option(d.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq
    parts(new File(ver, t)) ++ parts(new File(new File(ver, t), "_l0"))
  }

  private val bucketId = "_(\\d{5})\\.".r

  /** (table, bucket-or-raw) groups REWRITTEN in `ver` vs `prev` — files
    * that are not hard links of a same-named file in the previous
    * version.
    */
  private def rewrittenSlices(prev: File, ver: File,
      tables: Seq[String]): Set[(String, String)] =
    tables.flatMap { t =>
      dataFiles(ver, t).filter { f =>
        val old = new File(prev, s"$t/${f.getName}")
        !(old.exists() && java.nio.file.Files.isSameFile(f.toPath, old.toPath))
      }.map(f => t -> bucketId.findFirstMatchIn(f.getName)
        .map(_.group(1)).getOrElse("raw"))
    }.toSet

  test("contain: budget=1 slices the purge one bucket per call, probe " +
      "invariant per slice, no redone work, sidecar drops on the final " +
      "slice, df links throughout") {
    import spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("graft-pbudget-contain").toString
    val corpus = docs.filter($"doc_id" % 5 =!= 4)
    ContainIndex.build(spark, corpus, idx)
    val delta = docs.filter($"doc_id" % 5 === 4)
    val before = pairSet(ContainIndex.probe(spark, idx, delta))
    assert(before.nonEmpty, "fixture must contain cross-split pairs")
    val deltaIds = delta.select($"doc_id").collect().map(_.getLong(0)).toSet
    val dropIds = before.flatMap(p =>
      Seq(p._1, p._2).filterNot(deltaIds.contains)).toSeq.sorted.take(2)
    assert(ContainIndex.delete(spark, idx, dropIds.toDF("doc_id"),
      "pbudget-td"))
    val after = pairSet(ContainIndex.probe(spark, idx, delta))
    assert(after !== before, "the tombstoned ids dropped no pairs")

    // expected pending slices: every non-empty bucket of the
    // whole-rewrite tables (tokens/prefix), plus the AFFECTED buckets of
    // the doc_id-bucketed sets that actually hold files
    val v0 = currentVerDir(idx)
    val meta = new graft.streaming.VersionedArtifact(idx).meta
    def buckets(t: String): Set[String] = dataFiles(v0, t)
      .flatMap(f => bucketId.findFirstMatchIn(f.getName).map(_.group(1)))
      .toSet
    val setsAffected = IndexTombstones.affectedBuckets(
      spark.read.parquet(new File(v0, "tombstones").getAbsolutePath),
      IndexLayout.specOf(meta, "sets").buckets)
    val expected = buckets("tokens").size + buckets("prefix").size +
      (buckets("sets") intersect setsAffected).size
    assert(expected > 1, "fixture must need more than one slice at " +
      s"budget = 1 (got $expected) or the test pins nothing")

    val dfFiles = dataFiles(v0, "df").map(_.getName).toSet
    var slices = 0
    var done = false
    while (!done) {
      val prev = currentVerDir(idx)
      assert(ContainIndex.purge(spark, idx, budget = 1),
        "a pending purge slice must commit a version")
      slices += 1
      assert(slices <= expected + 1, "purge is redoing finished slices")
      val ver = currentVerDir(idx)
      val rewritten =
        rewrittenSlices(prev, ver, Seq("tokens", "prefix", "sets"))
      assert(rewritten.size <= 1,
        s"slice $slices rewrote more than its budget: $rewritten")
      done = !ContainIndex.purgePending(idx)
      if (!done)
        assert(new File(ver, IndexTombstones.Table).isDirectory,
          "sidecar dropped before the purge completed — probes would " +
            "resurface the not-yet-rewritten rows")
      assert(pairSet(ContainIndex.probe(spark, idx, delta)) === after,
        s"probe output changed after slice $slices")
      assert(dataFiles(ver, "df").map(_.getName).toSet === dfFiles,
        "df must carry as links through every slice")
    }
    assert(slices === expected,
      s"expected $expected slices at budget = 1, ran $slices — progress " +
        "is not carrying between calls")
    val ver = currentVerDir(idx)
    assert(!new File(ver, IndexTombstones.Table).exists(),
      "the final slice must drop the tombstone sidecar")
    assert(!new File(ver, "_purge.txt").exists(),
      "the final slice must drop the progress marker")
    for (t <- Seq("tokens", "prefix", "sets")) {
      val ids = spark.read.parquet(new File(ver, t).getAbsolutePath)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(dropIds.forall(!ids.contains(_)),
        s"$t still holds tombstoned rows after the sliced purge")
    }
    // the artifact stays a normal citizen: bucketed probes, no-op purge
    assert(!ContainIndex.purge(spark, idx), "purge with no tombstones fired")
    assert(pairSet(ContainIndex.probe(spark, idx, delta)) === after)
  }

  test("dedup: an out-of-band compaction folding L0 mid-purge RESTARTS " +
      "the progress — tombstoned L0 rows re-bucketed into already-done " +
      "buckets are still physically gone at completion") {
    import spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("graft-pbudget-compact").toString
    DedupIndex.build(spark, docs.filter($"doc_id" % 5 =!= 4), idx,
      DedupIndex.Shape.Oracle)
    // admit a delta: its band rows land in bands/_l0 (the L0 accrual
    // path), covered by the purge's LAST-sorting bands/raw slice
    val delta = docs.filter($"doc_id" % 5 === 4)
    assert(DedupIndex.append(spark, delta, idx, "pbc-adm"))
    val v1 = currentVerDir(idx)
    assert(dataFiles(v1, "bands").exists(
      _.getParentFile.getName == "_l0"),
      "fixture must admit through the L0 path or this pins nothing")
    // tombstone an ADMITTED doc — its band rows sit in L0
    val dropId = delta.select($"doc_id").orderBy($"doc_id").limit(1)
      .collect().head.getLong(0)
    assert(DedupIndex.delete(spark, idx, Seq(dropId).toDF("doc_id"),
      "pbc-td"))
    def purgeLines(): Seq[String] = {
      val f = new File(currentVerDir(idx), "_purge.txt")
      if (!f.exists()) Nil
      else new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).split("\n").toSeq
        .tail.filter(_.nonEmpty)
    }
    // slice until at least one NUMBERED bands bucket is done while
    // bands/raw is still pending — the r18-ADVICE leak window.
    // (purgePending is false until the FIRST slice commits a progress
    // file, so fire one slice before polling it.)
    assert(DedupIndex.purge(spark, idx, budget = 1))
    var guard = 1
    while (DedupIndex.purgePending(idx) &&
        !purgeLines().exists(l => l.startsWith("bands/") &&
          l != "bands/raw")) {
      assert(DedupIndex.purge(spark, idx, budget = 1))
      guard += 1
      assert(guard < 64, "never reached a done bands bucket")
    }
    assert(DedupIndex.purgePending(idx) &&
      !purgeLines().contains("bands/raw"),
      "fixture must leave bands/raw pending with a bands bucket done " +
        "or the leak window closes before the compaction")
    // the out-of-band compaction: folds bands/_l0 (tombstoned rows
    // included) into bucket-named files — some in already-done buckets
    assert(DedupIndex.compact(spark, idx, maxFiles = 0) > 0,
      "compaction must fire (L0 accrual present)")
    assert(DedupIndex.purgePending(idx),
      "compaction must carry the purge marker")
    assert(purgeLines().isEmpty,
      "compaction folding L0 must CLEAR the done-slice progress — " +
        "done buckets now hold re-bucketed tombstoned rows")
    guard = 0
    while (DedupIndex.purgePending(idx)) {
      assert(DedupIndex.purge(spark, idx, budget = 1))
      guard += 1
      assert(guard < 128, "restarted purge did not converge")
    }
    val ver = currentVerDir(idx)
    assert(!new File(ver, IndexTombstones.Table).exists())
    for (t <- Seq("signatures", "bands")) {
      val ids = spark.read.parquet(
        dataFiles(ver, t).map(_.getAbsolutePath): _*)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(!ids.contains(dropId),
        s"$t still physically holds the tombstoned doc after a " +
          "completed purge — the mid-purge compaction leaked it")
    }
  }

  test("dedup: a NEW tombstone admitted mid-purge restarts the progress " +
      "(fingerprint change) and BOTH sets are physically gone at " +
      "completion") {
    import spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("graft-pbudget-restart").toString
    val corpus = docs.filter($"doc_id" % 5 =!= 4)
    DedupIndex.build(spark, corpus, idx, DedupIndex.Shape.Oracle)
    val delta = docs.filter($"doc_id" % 5 === 4)
    val before = pairSet(DedupIndex.probe(spark, idx, delta))
    val ids = before.map(_._1).toSeq.sorted
    assert(ids.size >= 2, "fixture must yield two corpus-side pair ids")

    assert(DedupIndex.delete(spark, idx, Seq(ids(0)).toDF("doc_id"),
      "pbr-td-1"))
    assert(DedupIndex.purge(spark, idx, budget = 1))
    assert(DedupIndex.purgePending(idx),
      "fixture must need more than one slice at budget = 1 " +
        "or the restart case pins nothing")
    // a SECOND takedown lands mid-purge — new sidecar file, new
    // fingerprint; the purge must restart, not finish against the old set
    assert(DedupIndex.delete(spark, idx, Seq(ids(1)).toDF("doc_id"),
      "pbr-td-2"))
    var guard = 0
    while (DedupIndex.purgePending(idx) ||
        new File(currentVerDir(idx), IndexTombstones.Table).exists()) {
      assert(DedupIndex.purge(spark, idx, budget = 1))
      guard += 1
      assert(guard < 64, "sliced purge did not converge")
    }
    val ver = currentVerDir(idx)
    for (t <- Seq("signatures", "bands")) {
      val got = spark.read.parquet(new File(ver, t).getAbsolutePath)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(!got.contains(ids(0)) && !got.contains(ids(1)),
        s"$t still holds a tombstoned row — the mid-purge fingerprint " +
          "restart lost one of the sets")
    }
    assert(pairSet(DedupIndex.probe(spark, idx, delta)) ===
      before.filterNot(p => Set(ids(0), ids(1)).contains(p._1) ||
        Set(ids(0), ids(1)).contains(p._2)))
  }
}
