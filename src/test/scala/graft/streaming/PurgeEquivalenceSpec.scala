package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** PURGE-EQUIVALENCE for readers (r18): a budget-sliced purge bumps the
  * artifact version once per slice, but every slice is reader-invisible
  * by the purge contract (sidecar + logical filter hold until the final
  * slice; the rewrite drops only rows the filter already hides). A
  * cached reader that reloaded per slice would re-materialize a
  * corpus-sized cache ceil(buckets/budget) times for bit-identical
  * answers — at 100 TB, the dominant cost of a compliance purge would
  * be paid by every READER, not the writer. Pinned here:
  *
  *   1. CACHE SEMANTICS (unit, stub thunks): same version → no load;
  *      purge-pending bump with unchanged deltas → version adopted, NO
  *      load; any bump that changed appliedDeltas (admission OR new
  *      takedown — its filter must apply) → load; completion (pending
  *      false) → load.
  *   2. READER STREAM (integration): a probe-only cached reader over a
  *      text artifact pays exactly THREE loads across a takedown + a
  *      multi-slice purge + completion — one initial, one for the
  *      takedown, one at completion; zero per slice — with pairs
  *      correctly filtered in every batch.
  *   3. WRITER RETENTION: while its sliced purge is mid-flight, the
  *      admitting stream's prune keeps the whole slice chain (readers
  *      are pinned on the pre-chain version), and the chain drops one
  *      batch after completion.
  */
class PurgeEquivalenceSpec extends SparkSpec {

  test("cache semantics: purge-pending bumps with unchanged deltas " +
      "adopt the version without reloading; deltas changes and " +
      "completion reload") {
    var version: Option[Long] = Some(0L)
    var pending = false
    var deltas = Set.empty[String]
    var loads = 0
    val cache = new IngestDedup.VersionedCache[String](
      () => version, () => { loads += 1; s"load$loads" }, _ => Seq.empty,
      () => pending, () => deltas)
    assert(cache.get() === "load1" && cache.get() === "load1" && loads === 1)
    // takedown admission: version + deltas move together -> reload
    version = Some(1L); deltas = Set("td-1")
    assert(cache.get() === "load2" && loads === 2)
    // sliced purge: bumps with pending=true and unchanged deltas -> skip
    pending = true
    version = Some(2L)
    assert(cache.get() === "load2" && loads === 2, "slice bump reloaded")
    version = Some(3L)
    assert(cache.get() === "load2" && loads === 2, "slice bump reloaded")
    // completion: pending drops -> exactly one reload
    pending = false; version = Some(4L)
    assert(cache.get() === "load3" && loads === 3)
    // an admission DURING a later purge must reload (its docs must be
    // probed against), pending or not
    pending = true; version = Some(5L); deltas = Set("td-1", "day-9")
    assert(cache.get() === "load4" && loads === 4)
  }

  test("cache semantics: a purge-completion commit BEFORE the load is " +
      "keyed at the version the load resolves (no second reload); ANY " +
      "commit DURING the load keeps the pre-load key (reloads next poll)") {
    var version: Option[Long] = Some(0L)
    var deltas = Set.empty[String]
    var loads = 0
    var onLoad: () => Unit = () => ()
    var pendingF: () => Boolean = () => false
    val cache = new IngestDedup.VersionedCache[String](
      () => version, () => { loads += 1; onLoad(); s"load$loads" },
      _ => Seq.empty, () => pendingF(), () => deltas)
    assert(cache.get() === "load1" && loads === 1)
    deltas = Set("td-1"); version = Some(1L) // the takedown -> reload
    assert(cache.get() === "load2" && loads === 2)
    // the r18-ADVICE race: the FINAL purge slice commits between the
    // poll's currentVersion() read and the purgePending() read — the
    // load that follows resolves the NEW pointer, so the new version
    // is the right key and the next poll must NOT reload again
    version = Some(5L)
    pendingF = () => { version = Some(6L); false } // completion mid-poll
    assert(cache.get() === "load3" && loads === 3)
    pendingF = () => false
    assert(cache.get() === "load3" && loads === 3,
      "keying the pre-load version forced a wasted second reload")
    // ANY commit landing DURING the load (admission, compaction fold,
    // another slice) must NOT be adopted: the loaded frames may belong
    // to the older version, and keying them under the new version
    // would suppress the reload the writer's prune grace depends on
    // (stale frames over soon-pruned files). Conservative: keep the
    // pre-load key, reload next poll.
    version = Some(7L); deltas = Set("td-1", "day-1")
    onLoad = () => { version = Some(8L) }
    assert(cache.get() === "load4" && loads === 4)
    onLoad = () => ()
    assert(cache.get() === "load5" && loads === 5,
      "a commit during the load was adopted without its frames")
  }

  test("a probe-only reader STARTED mid-chain never prunes: every " +
      "version on disk survives the out-of-band writer's slices") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-peqm-idx").toString
    graft.analytics.DedupIndex.build(spark,
      docs.filter($"doc_id" % 5 =!= 4), idx)
    val delta = docs.filter($"doc_id" % 5 === 4)
      .as[IngestDoc].collect().sortBy(_.doc_id).toSeq
    // out-of-band takedown + first purge slice: the reader will START
    // with the chain already mid-flight, so its grace SEEDS nonzero
    val dropId = docs.filter($"doc_id" % 5 =!= 4)
      .select($"doc_id").orderBy($"doc_id").limit(1)
      .collect().head.getLong(0)
    assert(graft.analytics.DedupIndex.delete(spark, idx,
      Seq(dropId).toDF("doc_id"), "peqm-td"))
    assert(graft.analytics.DedupIndex.purge(spark, idx, budget = 1))
    assert(graft.analytics.DedupIndex.purgePending(idx),
      "fixture must need more than one slice at budget = 1")
    def verDirs(): Set[Long] = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .map(_.getName.stripPrefix("v").toLong).toSet
    val dirs0 = verDirs()
    val vPin = graft.analytics.DedupIndex.currentVersion(idx).get
    val input = MemoryStream[IngestDoc]
    val loads0 = graft.analytics.DedupIndex.loadRuns.get()
    val q = IngestDedup.dedupIngestFromIndex(input.toDS(), idx,
      java.nio.file.Files.createTempDirectory("graft-peqm-ck").toString) {
        (pairs, _) => pairs.count(); ()
      }
    def loads() = graft.analytics.DedupIndex.loadRuns.get() - loads0
    try {
      input.addData(delta); q.processAllAvailable()
      assert(loads() === 1)
      // a reader seeded mid-chain has bumps=0 forever — it must never
      // prune. Pre-fix it pruned with a FIXED keep (seed+1) while the
      // writer's slices advanced cur, deleting the chain base after one
      // slice and its own pinned version after seed+1 (r18 ADVICE).
      var slices = 1
      while (graft.analytics.DedupIndex.purgePending(idx) && slices < 64) {
        assert(graft.analytics.DedupIndex.purge(spark, idx, budget = 1))
        slices += 1
        // feed + assert only while STILL mid-chain: the completing
        // slice's next batch correctly reloads (pending turned false)
        if (graft.analytics.DedupIndex.purgePending(idx)) {
          input.addData(delta.take(4)); q.processAllAvailable()
          assert(dirs0.subsetOf(verDirs()),
            s"reader pruned ${dirs0 -- verDirs()} after slice $slices — " +
              "pure readers must never prune")
          assert(loads() === 1,
            s"reader reloaded on purge slice $slices")
        }
      }
      assert(slices >= 2, "purge fit one slice — the mid-chain window " +
        "pins nothing")
      assert(verDirs().contains(vPin),
        "the reader's own pinned version was deleted mid-chain")
      // completion: the reader reloads once and keeps answering
      input.addData(delta); q.processAllAvailable()
      assert(loads() === 2, "completion must reload exactly once")
      input.addData(delta.take(4)); q.processAllAvailable()
      assert(q.isActive)
    } finally q.stop()
  }

  test("a probe-only cached reader pays one reload for the takedown and " +
      "one at purge completion - none per slice - with pairs filtered " +
      "throughout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-peq-idx").toString
    graft.analytics.DedupIndex.build(spark,
      docs.filter($"doc_id" % 5 =!= 4), idx)
    val delta = docs.filter($"doc_id" % 5 === 4)
      .as[IngestDoc].collect().sortBy(_.doc_id).toSeq
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val input = MemoryStream[IngestDoc]
    val loads0 = graft.analytics.DedupIndex.loadRuns.get()
    val q = IngestDedup.dedupIngestFromIndex(input.toDS(), idx,
      java.nio.file.Files.createTempDirectory("graft-peq-ck").toString) {
        (pairs, batchId) =>
          pairs.collect().foreach(r =>
            got += ((r.getLong(0), r.getLong(1), batchId)))
      }
    def loads() = graft.analytics.DedupIndex.loadRuns.get() - loads0
    def feed(b: Seq[IngestDoc]): Unit = {
      input.addData(b); q.processAllAvailable()
    }
    try {
      assert(loads() === 1, "eager first load")
      feed(delta)
      assert(loads() === 1, "same-version batch must not reload")
      val matched = got.filter(_._3 == 0L).map(_._1).distinct.sorted
      assert(matched.nonEmpty, "fixture must contain cross-split pairs")
      val dropId = matched.head
      // out-of-band takedown (reader stream is not the writer): the
      // deltas change, so the NEXT batch reloads and probes filtered
      assert(graft.analytics.DedupIndex.delete(spark, idx,
        Seq(dropId).toDF("doc_id"), "peq-td"))
      feed(delta)
      assert(loads() === 2, "takedown must reload (its filter applies)")
      assert(got.filter(_._3 == 1L).forall(p =>
        p._1 != dropId && p._2 != dropId), "takedown filter missing")
      // out-of-band sliced purge: every slice bumps the version; the
      // reader batches between slices must NOT reload
      assert(graft.analytics.DedupIndex.purge(spark, idx, budget = 1))
      var slices = 1
      while (graft.analytics.DedupIndex.purgePending(idx) && slices < 64) {
        feed(delta)
        assert(loads() === 2,
          s"reader reloaded on purge slice $slices — equivalence skip " +
            "broken")
        assert(graft.analytics.DedupIndex.purge(spark, idx, budget = 1))
        slices += 1
      }
      assert(slices >= 2,
        "whole purge fit one slice — fixture pins nothing")
      // completion: exactly one reload, same filtered answer
      feed(delta)
      assert(loads() === 3, "purge completion must reload exactly once")
      val last = got.filter(_._3 == got.map(_._3).max)
      assert(last.nonEmpty && last.forall(p =>
        p._1 != dropId && p._2 != dropId))
    } finally q.stop()
  }

  test("the embed and contain faces wire the same skip: a probe-only " +
      "reader on each pays zero reloads per slice") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"

    // embed face
    val vecs = graft.GraftSession.table(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
    val sIdx = java.nio.file.Files
      .createTempDirectory("graft-peq-srp").toString
    graft.analytics.SrpIndex.build(spark,
      vecs.filter($"vec_id" % 5 =!= 4), sIdx,
      graft.analytics.DedupQueries.Srp.Narrow)
    val vDelta = vecs.filter($"vec_id" % 5 === 4)
      .as[IngestVec].collect().sortBy(_.vec_id).toSeq
    val vIn = MemoryStream[IngestVec]
    val vLoads0 = graft.analytics.SrpIndex.loadRuns.get()
    val vq = IngestDedup.dedupIngestEmbeddings(vIn.toDS(), sIdx,
      java.nio.file.Files.createTempDirectory("graft-peq-sck").toString) {
        (p, _) => p.count(); ()
      }
    def vLoads() = graft.analytics.SrpIndex.loadRuns.get() - vLoads0
    try {
      vIn.addData(vDelta); vq.processAllAvailable()
      assert(vLoads() === 1)
      val anyId = vecs.filter($"vec_id" % 5 =!= 4)
        .select($"vec_id").orderBy($"vec_id").limit(1)
        .collect().head.getLong(0)
      assert(graft.analytics.SrpIndex.delete(spark, sIdx,
        Seq(anyId).toDF("vec_id"), "peq-srp-td"))
      vIn.addData(vDelta); vq.processAllAvailable()
      assert(vLoads() === 2, "embed face: takedown must reload")
      assert(graft.analytics.SrpIndex.purge(spark, sIdx, budget = 1))
      var slices = 1
      while (graft.analytics.SrpIndex.purgePending(sIdx) && slices < 64) {
        vIn.addData(vDelta); vq.processAllAvailable()
        assert(vLoads() === 2,
          s"embed face reloaded on purge slice $slices")
        assert(graft.analytics.SrpIndex.purge(spark, sIdx, budget = 1))
        slices += 1
      }
      assert(slices >= 2, "embed purge fit one slice — pins nothing")
      vIn.addData(vDelta); vq.processAllAvailable()
      assert(vLoads() === 3, "embed face: completion must reload once")
    } finally vq.stop()

    // contain face
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val cIdx = java.nio.file.Files
      .createTempDirectory("graft-peq-contain").toString
    graft.analytics.ContainIndex.build(spark,
      docs.filter($"doc_id" % 5 =!= 4), cIdx)
    val cDelta = docs.filter($"doc_id" % 5 === 4)
      .as[IngestDoc].collect().sortBy(_.doc_id).toSeq
    val cIn = MemoryStream[IngestDoc]
    val cLoads0 = graft.analytics.ContainIndex.loadRuns.get()
    val cq = IngestDedup.dedupIngestContainment(cIn.toDS(), cIdx,
      java.nio.file.Files.createTempDirectory("graft-peq-cck").toString) {
        (p, _) => p.count(); ()
      }
    def cLoads() = graft.analytics.ContainIndex.loadRuns.get() - cLoads0
    try {
      cIn.addData(cDelta); cq.processAllAvailable()
      assert(cLoads() === 1)
      val anyDoc = docs.filter($"doc_id" % 5 =!= 4)
        .select($"doc_id").orderBy($"doc_id").limit(1)
        .collect().head.getLong(0)
      assert(graft.analytics.ContainIndex.delete(spark, cIdx,
        Seq(anyDoc).toDF("doc_id"), "peq-c-td"))
      cIn.addData(cDelta); cq.processAllAvailable()
      assert(cLoads() === 2, "contain face: takedown must reload")
      assert(graft.analytics.ContainIndex.purge(spark, cIdx, budget = 1))
      var cSlices = 1
      while (graft.analytics.ContainIndex.purgePending(cIdx) &&
          cSlices < 64) {
        cIn.addData(cDelta); cq.processAllAvailable()
        assert(cLoads() === 2,
          s"contain face reloaded on purge slice $cSlices")
        assert(graft.analytics.ContainIndex.purge(spark, cIdx, budget = 1))
        cSlices += 1
      }
      assert(cSlices >= 2, "contain purge fit one slice — pins nothing")
      cIn.addData(cDelta); cq.processAllAvailable()
      assert(cLoads() === 3, "contain face: completion must reload once")
    } finally cq.stop()
  }

  test("writer retention: the admitting stream keeps the whole slice " +
      "chain while its purge is pending, and drops it one batch after " +
      "completion") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-peqw-idx").toString
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
      java.nio.file.Files.createTempDirectory("graft-peqw-ck").toString,
      admitId = Some("peqw"), takedowns = Some(tq)) { (pairs, batchId) =>
        pairs.collect().foreach(r =>
          got += ((r.getLong(0), r.getLong(1), batchId)))
      }
    def verDirs(): Set[Long] = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .map(_.getName.stripPrefix("v").toLong).toSet
    try {
      input.addData(delta); q.processAllAvailable()
      val matched = got.filter(_._3 == 0L).map(_._1).distinct.sorted
      assert(matched.nonEmpty, "fixture must contain cross-split pairs")
      // vPre: the version a reader pinned BEFORE the purge chain
      val vPre = graft.analytics.DedupIndex.currentVersion(idx).get
      tq.request(Seq(matched.head), "peqw-td")
      val b1 = delta.map(d => d.copy(doc_id = d.doc_id + 990000000L))
      input.addData(b1); q.processAllAvailable()
      assert(graft.analytics.DedupIndex.purgePending(idx),
        "budget=1 must leave the purge pending after the drain batch")
      // mid-chain: vPre must still be on disk (readers are pinned there)
      var batch = 1
      while (graft.analytics.DedupIndex.purgePending(idx) && batch < 8) {
        assert(verDirs().contains(vPre),
          s"pre-chain version v$vPre pruned mid-purge (batch $batch) — " +
            "readers skipping slice reloads would lose their files")
        batch += 1
        val bn = delta.take(4)
          .map(d => d.copy(doc_id = d.doc_id + 990000000L * batch))
        input.addData(bn); q.processAllAvailable()
      }
      assert(!graft.analytics.DedupIndex.purgePending(idx),
        s"purge still pending after $batch batches")
      // the completion batch retains the chain one more batch
      assert(verDirs().contains(vPre),
        "completion batch must retain the chain (readers reload on " +
          "their NEXT poll)")
      batch += 1
      input.addData(delta.take(4)
        .map(d => d.copy(doc_id = d.doc_id + 990000000L * batch)))
      q.processAllAvailable()
      assert(!verDirs().contains(vPre),
        "the batch after completion must drop the chain (disk bounded)")
      assert(q.isActive)
    } finally {
      q.stop()
      prevRatio.fold(spark.conf.unset("spark.graft.index.purge.ratio"))(
        spark.conf.set("spark.graft.index.purge.ratio", _))
      prevBudget.fold(spark.conf.unset("spark.graft.index.purge.budget"))(
        spark.conf.set("spark.graft.index.purge.budget", _))
    }
  }

  test("writer restart mid-chain: the new stream re-seeds its grace " +
      "from disk, so surviving readers' pinned chain base is retained " +
      "until the resumed purge completes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-peqr-idx").toString
    graft.analytics.DedupIndex.build(spark,
      docs.filter($"doc_id" % 5 =!= 4), idx)
    val delta = docs.filter($"doc_id" % 5 === 4)
      .as[IngestDoc].collect().sortBy(_.doc_id).toSeq
    val prevRatio = spark.conf.getOption("spark.graft.index.purge.ratio")
    val prevBudget = spark.conf.getOption("spark.graft.index.purge.budget")
    spark.conf.set("spark.graft.index.purge.ratio", "0.001")
    spark.conf.set("spark.graft.index.purge.budget", "1")
    def verDirs(): Set[Long] = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .map(_.getName.stripPrefix("v").toLong).toSet
    def openStream(tag: String, tq: TakedownQueue) = {
      val input = MemoryStream[IngestDoc]
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val q = IngestDedup.dedupIngestFromIndex(input.toDS(), idx,
        java.nio.file.Files.createTempDirectory(s"graft-peqr-$tag").toString,
        admitId = Some(s"peqr-$tag"), takedowns = Some(tq)) { (pairs, _) =>
          pairs.collect().foreach(r => got += ((r.getLong(0), r.getLong(1))))
        }
      (input, got, q)
    }
    val tq1 = new TakedownQueue
    val (in1, got1, q1) = openStream("a", tq1)
    try {
      in1.addData(delta); q1.processAllAvailable()
      val matched = got1.map(_._1).distinct.sorted
      assert(matched.nonEmpty, "fixture must contain cross-split pairs")
      val vPre = graft.analytics.DedupIndex.currentVersion(idx).get
      tq1.request(Seq(matched.head), "peqr-td")
      in1.addData(delta.map(d => d.copy(doc_id = d.doc_id + 990000000L)))
      q1.processAllAvailable()
      assert(graft.analytics.DedupIndex.purgePending(idx),
        "budget=1 must leave the purge pending after the drain batch")
      // "crash": the writer stops mid-chain; its in-memory grace dies
      q1.stop()
      assert(verDirs().contains(vPre))
      // restarted writer (fresh checkpoint + fresh TakedownQueue): its
      // seeded grace must keep vPre through the resumed slices
      val (in2, _, q2) = openStream("b", new TakedownQueue)
      try {
        var batch = 1
        while (graft.analytics.DedupIndex.purgePending(idx) && batch < 10) {
          assert(verDirs().contains(vPre),
            s"restarted writer pruned the chain base v$vPre mid-purge " +
              s"(batch $batch) — the on-disk grace seed is broken")
          in2.addData(delta.take(4)
            .map(d => d.copy(doc_id = d.doc_id + 991000000L * batch)))
          q2.processAllAvailable()
          batch += 1
        }
        assert(!graft.analytics.DedupIndex.purgePending(idx),
          s"purge still pending after $batch restarted batches")
        // completion batch retained the chain; the next drops it
        assert(verDirs().contains(vPre))
        in2.addData(delta.take(4)
          .map(d => d.copy(doc_id = d.doc_id + 999000000L)))
        q2.processAllAvailable()
        assert(!verDirs().contains(vPre),
          "the batch after completion must drop the chain")
      } finally q2.stop()
    } finally {
      q1.stop()
      prevRatio.fold(spark.conf.unset("spark.graft.index.purge.ratio"))(
        spark.conf.set("spark.graft.index.purge.ratio", _))
      prevBudget.fold(spark.conf.unset("spark.graft.index.purge.budget"))(
        spark.conf.set("spark.graft.index.purge.budget", _))
    }
  }
}
