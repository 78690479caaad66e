package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The BUDGETED auto-purge under a RUNNING admitting stream — the
  * r17-verdict #1 done-criterion: a delete-heavy stream that crosses
  * the purge ratio must not pay an O(corpus-table) pause in any single
  * batch. With `spark.graft.index.purge.budget = 1`:
  *
  *   - the DRAINING batch commits exactly one purge slice (delete bump
  *     + one slice bump), leaving the purge pending and the sidecar in
  *     place;
  *   - every SUBSEQUENT batch continues one slice — with NO further
  *     takedowns arriving (`purgePending` drives the continuation, not
  *     the drain);
  *   - probe output stays filtered throughout (logical tombstones cover
  *     whatever is not yet physically rewritten);
  *   - the purge completes within the expected slice count: sidecar and
  *     progress marker gone, rows physically gone, stream alive.
  */
class PurgeStreamSpec extends SparkSpec with org.scalatest.BeforeAndAfterEach {

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


  test("budget=1: the drain batch slices instead of stalling; quiet " +
      "batches continue the purge to completion") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-pstream-idx").toString
    graft.analytics.DedupIndex.build(spark,
      docs.filter($"doc_id" % 5 =!= 4), idx)
    val delta = docs.filter($"doc_id" % 5 === 4)
      .as[IngestDoc].collect().sortBy(_.doc_id).toSeq
    val tq = new TakedownQueue
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val input = MemoryStream[IngestDoc]
    val prevRatio = spark.conf.getOption("spark.graft.index.purge.ratio")
    val prevBudget = spark.conf.getOption("spark.graft.index.purge.budget")
    spark.conf.set("spark.graft.index.purge.ratio", "0.001")
    spark.conf.set("spark.graft.index.purge.budget", "1")
    val q = IngestDedup.dedupIngestFromIndex(input.toDS(), idx,
      java.nio.file.Files.createTempDirectory("graft-pstream-ck").toString,
      admitId = Some("pstream"), takedowns = Some(tq)) { (pairs, batchId) =>
        pairs.collect().foreach(r =>
          got += ((r.getLong(0), r.getLong(1), batchId)))
      }
    try {
      input.addData(delta); q.processAllAvailable()
      val matched = got.filter(_._3 == 0L).map(_._1).distinct.sorted
      assert(matched.nonEmpty, "fixture must contain cross-split pairs")
      val dropId = matched.head
      tq.request(Seq(dropId), "pstream-td-1")
      // the draining batch: delete + ONE slice, NOT the whole purge
      val b1 = delta.map(d => d.copy(doc_id = d.doc_id + 990000000L))
      input.addData(b1); q.processAllAvailable()
      assert(tq.isEmpty, "the loop did not drain the takedown queue")
      assert(graft.analytics.DedupIndex.purgePending(idx),
        "budget=1 must leave the purge pending after the drain batch " +
          "(if the whole purge fit one slice this fixture pins nothing)")
      def curVer() = new java.io.File(idx,
        s"v${graft.analytics.DedupIndex.currentVersion(idx).get}")
      assert(new java.io.File(curVer(), "tombstones").isDirectory,
        "sidecar must survive until the final slice")
      // quiet continuation: NO new takedowns; each batch runs one slice.
      // bands (whole-rewrite) + 1 affected signatures bucket at local[4]
      // is ~5 slices; 8 batches is comfortably past it — assert the
      // purge completes strictly before the cap
      var batch = 1
      while (graft.analytics.DedupIndex.purgePending(idx) && batch < 8) {
        batch += 1
        val bn = delta.take(4)
          .map(d => d.copy(doc_id = d.doc_id + 990000000L * batch))
        input.addData(bn); q.processAllAvailable()
      }
      assert(!graft.analytics.DedupIndex.purgePending(idx),
        s"purge still pending after $batch batches — continuation stalled")
      val ver = curVer()
      assert(!new java.io.File(ver, "tombstones").exists(),
        "completed purge must drop the sidecar")
      assert(!new java.io.File(ver, "_purge.txt").exists(),
        "completed purge must drop the progress marker")
      val sigIds = spark.read.parquet(
        new java.io.File(ver, "signatures").getAbsolutePath)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(!sigIds.contains(dropId),
        "sliced purge left the tombstoned row in signatures")
      // every post-drain probe was filtered while the purge was pending
      // (the takedown drains at the END of batch 1, after its probe —
      // so the filter is in effect from batch 2 on, the same contract
      // as IngestAdmitSpec's TakedownQueue test)
      assert(got.filter(_._3 >= 2L).forall(p =>
        p._1 != dropId && p._2 != dropId),
        s"a batch probed the tombstoned id $dropId mid-purge")
      assert(q.isActive, "the sliced purge tripped the single-writer check")
    } finally {
      q.stop()
      prevRatio.fold(spark.conf.unset("spark.graft.index.purge.ratio"))(
        spark.conf.set("spark.graft.index.purge.ratio", _))
      prevBudget.fold(spark.conf.unset("spark.graft.index.purge.budget"))(
        spark.conf.set("spark.graft.index.purge.budget", _))
    }
  }

  test("compaction is DEFERRED while a sliced purge is pending — L0 " +
      "accrues mid-chain, the purge converges, and compaction resumes " +
      "on the first post-completion batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-pcomp-idx").toString
    graft.analytics.DedupIndex.build(spark,
      docs.filter($"doc_id" % 5 =!= 4), idx)
    val delta = docs.filter($"doc_id" % 5 === 4)
      .as[IngestDoc].collect().sortBy(_.doc_id).toSeq
    val tq = new TakedownQueue
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val input = MemoryStream[IngestDoc]
    val prevRatio = spark.conf.getOption("spark.graft.index.purge.ratio")
    val prevBudget = spark.conf.getOption("spark.graft.index.purge.budget")
    spark.conf.set("spark.graft.index.purge.ratio", "0.001")
    spark.conf.set("spark.graft.index.purge.budget", "1")
    // compactEvery=1 + maxFiles=0: compaction WANTS to fire every
    // non-empty batch and any accrual makes a table fat — the tightest
    // setting for observing the mid-purge deferral
    val q = IngestDedup.dedupIngestFromIndex(input.toDS(), idx,
      java.nio.file.Files.createTempDirectory("graft-pcomp-ck").toString,
      admitId = Some("pcomp"), compactEvery = 1, compactMaxFiles = 0,
      takedowns = Some(tq)) { (pairs, batchId) =>
        pairs.collect().foreach(r =>
          got += ((r.getLong(0), r.getLong(1), batchId)))
      }
    def l0Files(): Int = {
      val d = new java.io.File(idx,
        s"v${graft.analytics.DedupIndex.currentVersion(idx).get}" +
          "/bands/_l0")
      Option(d.listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
    }
    try {
      input.addData(delta); q.processAllAvailable()
      val matched = got.filter(_._3 == 0L).map(_._1).distinct.sorted
      assert(matched.nonEmpty, "fixture must contain cross-split pairs")
      tq.request(Seq(matched.head), "pcomp-td")
      // batch 1: admit + compact (purge not yet pending at compact
      // time — the drain at the END of this batch starts it)
      input.addData(delta.map(d => d.copy(doc_id = d.doc_id + 990000000L)))
      q.processAllAvailable()
      assert(graft.analytics.DedupIndex.purgePending(idx),
        "budget=1 must leave the purge pending after the drain batch")
      // mid-chain batches: compaction must be SKIPPED — each batch
      // bumps the version exactly TWICE (append + one purge slice);
      // a firing compaction would make it three (maxFiles=0 keeps the
      // bands table permanently "fat", so compaction always wants to)
      var batch = 1
      while (graft.analytics.DedupIndex.purgePending(idx) && batch < 12) {
        batch += 1
        val v0 = graft.analytics.DedupIndex.currentVersion(idx).get
        input.addData(delta.take(4)
          .map(d => d.copy(doc_id = d.doc_id + 990000000L * batch)))
        q.processAllAvailable()
        val bumps = graft.analytics.DedupIndex.currentVersion(idx).get - v0
        assert(bumps === 2L,
          s"batch $batch bumped $bumps times (expected 2: append + " +
            "slice) — compaction must be deferred while a sliced purge " +
            "is pending")
      }
      assert(!graft.analytics.DedupIndex.purgePending(idx),
        s"purge still pending after $batch batches — a mid-purge " +
          "compaction may be resetting its progress every batch")
      // post-completion: the next non-empty batch compacts again
      batch += 1
      input.addData(delta.take(4)
        .map(d => d.copy(doc_id = d.doc_id + 990000000L * batch)))
      q.processAllAvailable()
      assert(l0Files() === 0,
        "compaction did not resume on the first post-completion batch")
      assert(q.isActive)
    } finally {
      q.stop()
      prevRatio.fold(spark.conf.unset("spark.graft.index.purge.ratio"))(
        spark.conf.set("spark.graft.index.purge.ratio", _))
      prevBudget.fold(spark.conf.unset("spark.graft.index.purge.budget"))(
        spark.conf.set("spark.graft.index.purge.budget", _))
    }
  }
}
