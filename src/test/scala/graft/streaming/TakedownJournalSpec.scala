package graft.streaming

import java.io.File

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The [[TakedownQueue]] JOURNAL — the engine-side close of the
  * enqueued-but-undrained durability window (r17 verdict #4: the
  * documented re-request contract pushed compliance burden onto every
  * caller). Pinned:
  *
  *   1. PERSIST-BEFORE-ENQUEUE — a journaled request is on disk when
  *      `request` returns (one `.req` file per deltaId).
  *   2. REPLAY — a NEW queue over the same journal dir re-enqueues
  *      every undrained entry (ids and deltaId intact).
  *   3. TRUNCATE-ON-DRAIN — `markApplied` removes exactly the drained
  *      entries; a later queue replays nothing.
  *   4. END-TO-END — an admitting stream drains a replayed entry with
  *      NO caller re-request: ledger acknowledged, probe filtered,
  *      journal truncated. (The kill-between-enqueue-and-drain case
  *      with a REAL dead process lives in `CrashRecoverySpec`.)
  */
class TakedownJournalSpec extends SparkSpec {

  private def reqFiles(jd: String): Seq[String] =
    Option(new File(jd).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".req"))
      .map(_.getName).toSeq.sorted

  test("journal: persist on request, replay into a new queue, truncate " +
      "on markApplied") {
    val jd = java.nio.file.Files
      .createTempDirectory("graft-journal-unit").toString
    val tq = new TakedownQueue(Some(jd))
    tq.request(Seq(11L, 12L), "j-td-1")
    tq.request(Seq(13L), "j-td-2")
    assert(reqFiles(jd).size === 2,
      "each journaled request must persist as its own entry file")
    // same deltaId re-requested: same entry file (idempotent record)
    tq.request(Seq(11L, 12L), "j-td-1")
    assert(reqFiles(jd).size === 2)

    // a NEW queue over the same dir replays what was never drained —
    // one entry per journal file, the re-request collapsed
    val tq2 = new TakedownQueue(Some(jd))
    val replayed = tq2.drain()
    assert(replayed.map { case (ids, d) => (ids.toList, d) }.toSet ===
      Set((List(11L, 12L), "j-td-1"), (List(13L), "j-td-2")),
      s"replay lost or corrupted entries: $replayed")

    // truncation: drained entries leave the journal; nothing replays
    tq2.markApplied(replayed)
    assert(reqFiles(jd).isEmpty, "markApplied must truncate the journal")
    assert(new TakedownQueue(Some(jd)).isEmpty,
      "a truncated journal must replay nothing")
  }

  test("DEFAULT wiring is durable: the admitting stream attaches the " +
      "artifact journal to a plain queue — pre-start requests are " +
      "swept in, post-start requests persist, inMemory() opts out") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-journal-def-idx").toString
    graft.analytics.DedupIndex.build(spark,
      docs.filter($"doc_id" % 5 =!= 4), idx)
    val delta = docs.filter($"doc_id" % 5 === 4)
      .as[IngestDoc].collect().sortBy(_.doc_id).toSeq
    val jd = new File(idx, TakedownQueue.DefaultJournalName).getAbsolutePath

    // a request enqueued BEFORE the stream exists (in-memory at that
    // point) must be swept into the journal by the attach
    val tq = new TakedownQueue()
    tq.request(Seq(1L), "jdef-pre")
    assert(reqFiles(jd).isEmpty, "no journal before any stream attaches")
    val input = MemoryStream[IngestDoc]
    val q = IngestDedup.dedupIngestFromIndex(input.toDS(), idx,
      java.nio.file.Files.createTempDirectory("graft-jdef-ck").toString,
      admitId = Some("jdef"), takedowns = Some(tq)) { (pairs, _) =>
        pairs.count(); ()
      }
    try {
      assert(reqFiles(jd).size === 1,
        "the attach must sweep the pre-start request into the journal")
      // a post-start request persists before request() returns
      tq.request(Seq(2L), "jdef-post")
      assert(reqFiles(jd).size === 2,
        "a post-attach request must journal at request time")
      input.addData(delta.take(4)); q.processAllAvailable()
      assert(tq.isEmpty && reqFiles(jd).isEmpty,
        "the drain must truncate both journaled entries")
      assert(graft.analytics.DedupIndex.appliedDeltas(idx)
        .contains("jdef-pre") &&
        graft.analytics.DedupIndex.appliedDeltas(idx).contains("jdef-post"))
    } finally q.stop()

    // ONE artifact per queue: a second stream over a DIFFERENT index
    // dir handing the same queue must fail loudly at construction —
    // its requests would journal (and replay) under the wrong artifact
    val idx2 = java.nio.file.Files
      .createTempDirectory("graft-journal-def-idx2").toString
    graft.analytics.DedupIndex.build(spark,
      docs.filter($"doc_id" % 5 =!= 4), idx2)
    val inX = MemoryStream[IngestDoc]
    intercept[IllegalStateException] {
      IngestDedup.dedupIngestFromIndex(inX.toDS(), idx2,
        java.nio.file.Files.createTempDirectory("graft-jdef-ckx").toString,
        admitId = Some("jdefX"), takedowns = Some(tq)) { (p, _) =>
          p.count(); ()
        }
    }

    // opt-out: an inMemory() queue never touches the journal dir
    val tq2 = TakedownQueue.inMemory()
    val input2 = MemoryStream[IngestDoc]
    val q2 = IngestDedup.dedupIngestFromIndex(input2.toDS(), idx,
      java.nio.file.Files.createTempDirectory("graft-jdef-ck2").toString,
      admitId = Some("jdef2"), takedowns = Some(tq2)) { (pairs, _) =>
        pairs.count(); ()
      }
    try {
      tq2.request(Seq(3L), "jdef-mem")
      assert(reqFiles(jd).isEmpty,
        "inMemory() must stay in-memory — no journal entries")
      input2.addData(delta.take(4)); q2.processAllAvailable()
      assert(tq2.isEmpty)
    } finally q2.stop()
  }

  test("an admitting stream drains a REPLAYED journal entry with no " +
      "re-request: ledger acknowledged, probe filtered, journal truncated") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-journal-idx").toString
    graft.analytics.DedupIndex.build(spark,
      docs.filter($"doc_id" % 5 =!= 4), idx)
    val delta = docs.filter($"doc_id" % 5 === 4)
      .as[IngestDoc].collect().sortBy(_.doc_id).toSeq
    // which corpus ids pair (one batch probe, stream-free)
    val matched = graft.analytics.DedupIndex.probe(spark, idx,
        docs.filter($"doc_id" % 5 === 4))
      .collect().map(_.getLong(0)).distinct.sorted
    assert(matched.nonEmpty, "fixture must contain cross-split pairs")
    val dropId = matched.head

    // "previous process": journals the request, never drains it
    val jd = new File(idx, "_takedown_journal").getAbsolutePath
    new TakedownQueue(Some(jd)).request(Seq(dropId), "journal-td-1")

    // "restart": a fresh queue replays the entry; the stream drains it
    // without anyone calling request again
    val tq = new TakedownQueue(Some(jd))
    assert(!tq.isEmpty, "the journaled entry must replay on construction")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val input = MemoryStream[IngestDoc]
    val q = IngestDedup.dedupIngestFromIndex(input.toDS(), idx,
      java.nio.file.Files.createTempDirectory("graft-journal-ck").toString,
      admitId = Some("jstream"), takedowns = Some(tq)) { (pairs, batchId) =>
        pairs.collect().foreach(r =>
          got += ((r.getLong(0), r.getLong(1), batchId)))
      }
    try {
      input.addData(delta); q.processAllAvailable()
      assert(tq.isEmpty, "the loop did not drain the replayed takedown")
      assert(graft.analytics.DedupIndex.appliedDeltas(idx)
        .contains("journal-td-1"),
        "the replayed takedown must reach the applied-delta ledger")
      assert(reqFiles(jd).isEmpty,
        "the drained entry must truncate from the journal")
      // the NEXT batch's probe is filtered
      val b1 = delta.map(d => d.copy(doc_id = d.doc_id + 990000000L))
      input.addData(b1); q.processAllAvailable()
      val batch1 = got.filter(_._3 == 1L)
      assert(batch1.nonEmpty, "batch 1 must still report surviving pairs")
      assert(batch1.forall(p => p._1 != dropId && p._2 != dropId),
        s"batch 1 reported pairs touching the journaled takedown $dropId")
    } finally q.stop()
    assert(new TakedownQueue(Some(jd)).isEmpty,
      "a second restart must replay nothing after the drain committed")
  }

  test("a CORRUPT journal entry is quarantined at replay, never wedges " +
      "the restart, and healthy entries still replay") {
    val jd = java.nio.file.Files
      .createTempDirectory("graft-journal-poison").toString
    val tq = new TakedownQueue(Some(jd))
    tq.request(Seq(21L), "poison-healthy")
    // poison entries beside it: non-numeric id line, and an empty file —
    // written with valid .req names, the way bit rot or hand-editing
    // would leave them (the atomic-move protocol can't produce these,
    // which is exactly why replay must not assume it)
    java.nio.file.Files.write(new File(jd, "00deadbeef.req").toPath,
      "poison-bad-ids\nnot-a-long\n".getBytes("UTF-8"))
    java.nio.file.Files.write(new File(jd, "00feedface.req").toPath,
      Array.empty[Byte])

    // a restart replays the healthy entry and quarantines both poisoned
    // ones — a throwing replay would wedge EVERY restart forever
    val tq2 = new TakedownQueue(Some(jd))
    val replayed = tq2.drain()
    assert(replayed.map(_._2) === Seq("poison-healthy"),
      s"only the healthy entry must replay, got $replayed")
    val names = Option(new File(jd).listFiles()).getOrElse(Array.empty)
      .map(_.getName).toSet
    assert(names.contains("00deadbeef.req.quarantined") &&
      names.contains("00feedface.req.quarantined"),
      s"poisoned entries must quarantine in place (kept for forensics): $names")
    assert(!names.exists(n => n.endsWith(".req") &&
        (n.startsWith("00deadbeef") || n.startsWith("00feedface"))),
      "quarantined entries must leave the .req namespace")
    // ... and stay quarantined: the NEXT restart replays nothing new
    assert(new TakedownQueue(Some(jd)).drain().map(_._2) ===
      Seq("poison-healthy"))
  }

  test("EXPLICIT-journal queues get the same one-artifact tripwire: a " +
      "second stream over a different artifact fails loudly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    def freshIdx(tag: String): String = {
      val p = java.nio.file.Files
        .createTempDirectory(s"graft-journal-exp-$tag").toString
      graft.analytics.DedupIndex.build(spark,
        docs.filter($"doc_id" % 5 =!= 4), p)
      p
    }
    val (idxA, idxB) = (freshIdx("a"), freshIdx("b"))
    val jd = java.nio.file.Files
      .createTempDirectory("graft-journal-exp-jd").toString
    val tq = new TakedownQueue(Some(jd))
    val inA = MemoryStream[IngestDoc]
    val qA = IngestDedup.dedupIngestFromIndex(inA.toDS(), idxA,
      java.nio.file.Files.createTempDirectory("graft-jexp-cka").toString,
      admitId = Some("jexpA"), takedowns = Some(tq)) { (p, _) =>
        p.count(); ()
      }
    try {
      // same artifact again: fine (a restart re-attaches idempotently)
      val inA2 = MemoryStream[IngestDoc]
      val qA2 = IngestDedup.dedupIngestFromIndex(inA2.toDS(), idxA,
        java.nio.file.Files.createTempDirectory("graft-jexp-cka2").toString,
        admitId = Some("jexpA2"), takedowns = Some(tq)) { (p, _) =>
          p.count(); ()
        }
      qA2.stop()
      // DIFFERENT artifact: loud error — a shared explicit journal's
      // restart replay would apply one artifact's takedowns to the other
      val inB = MemoryStream[IngestDoc]
      intercept[IllegalStateException] {
        IngestDedup.dedupIngestFromIndex(inB.toDS(), idxB,
          java.nio.file.Files.createTempDirectory("graft-jexp-ckb").toString,
          admitId = Some("jexpB"), takedowns = Some(tq)) { (p, _) =>
            p.count(); ()
          }
      }
    } finally qA.stop()
  }
}
