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
}
