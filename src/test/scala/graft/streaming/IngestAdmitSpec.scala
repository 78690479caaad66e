package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The PROBE-THEN-ADMIT streaming loop (`admit = true` on the index
  * faces) — the full production shape: each micro-batch dedups against
  * the standing corpus, then becomes part of it. Pinned:
  *
  *   1. GROWTH + FRESHNESS — a near-dup planted in batch 1 of a doc
  *      that arrived in batch 0 is reported by batch 1's probe: batch
  *      0 was admitted and the `VersionedCache` picked up the pointer
  *      move within one batch.
  *   2. REDELIVERY SAFETY — batch 1 also re-sends a batch-0 doc
  *      verbatim (same doc_id): no self-pair (`id_a =!= id_b`), the
  *      documented re-probe contract.
  *   3. ADMISSION BOOKKEEPING — one `appliedDeltas` entry per batch,
  *      and a checkpoint-replayed deltaId is a no-op (`append`
  *      returns false), so Spark's at-least-once batch replay cannot
  *      double-admit.
  *   4. One artifact load per VERSION: initial load + one reload after
  *      batch 0's admission moved the pointer.
  */
class IngestAdmitSpec extends SparkSpec {

  test("probe-then-admit: batch N+1 dedups against batch N, replays " +
      "are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-admit-idx").toString
    graft.analytics.DedupIndex.build(spark,
      docs.filter($"doc_id" % 5 =!= 4), idx)

    val delta = docs.filter($"doc_id" % 5 === 4)
      .as[IngestDoc].collect().sortBy(_.doc_id)
    val b0 = delta.take(delta.length / 2).toSeq
    val seed = b0.head
    // batch 1: a verbatim near-dup COPY of a batch-0 doc under a fresh
    // id (the cross-batch pair the admitted index must surface), the
    // SAME batch-0 doc re-sent verbatim (must NOT self-pair), and the
    // rest of the delta
    val copyId = 990000001L
    val b1 = Seq(IngestDoc(copyId, seed.text), seed) ++
      delta.drop(delta.length / 2)

    val got = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Long, Long)]()  // (corpus_id, new_id, batchId)
    val input = MemoryStream[IngestDoc]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-admit-ckpt").toString
    val loadsBefore = graft.analytics.DedupIndex.loadRuns.get()
    // compactEvery = 1: the in-loop compaction seat — a no-op at this
    // artifact's file counts (compact's own 64-file threshold), pinned
    // here as exactly that: it must not perturb versions, deltas, or
    // the load count below
    val q = IngestDedup.dedupIngestFromIndex(input.toDS(), idx, ckpt,
      admit = true, compactEvery = 1) { (pairs, batchId) =>
        pairs.collect().foreach(r =>
          got.add((r.getLong(0), r.getLong(1), batchId)))
      }
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val pairs = got.asScala.toSet
    // 1. growth + freshness: the copy matched its batch-0 original
    assert(pairs.contains((seed.doc_id, copyId, 1L)),
      s"batch 1's probe missed the planted copy of the admitted " +
        s"batch-0 doc ${seed.doc_id}: $pairs")
    // 2. redelivery safety: the re-sent doc never pairs with itself
    assert(!pairs.exists(p => p._1 == p._2),
      s"self-pair reported for a re-sent admitted doc: $pairs")
    // 3. bookkeeping: one delta per batch; replaying a deltaId no-ops
    assert(graft.analytics.DedupIndex.appliedDeltas(idx) ===
      Set("batch-0", "batch-1"))
    assert(!graft.analytics.DedupIndex.append(spark,
        docs.filter($"doc_id" === seed.doc_id), idx, "batch-0"),
      "a replayed deltaId must be an admission no-op")
    assert(graft.analytics.DedupIndex.appliedDeltas(idx) ===
      Set("batch-0", "batch-1"), "the no-op replay mutated the delta set")
    // 4. one load per version: initial + the post-batch-0 reload
    assert(graft.analytics.DedupIndex.loadRuns.get() === loadsBefore + 2,
      "expected exactly initial load + one reload after batch 0's " +
        "admission moved the pointer")
  }

  test("containment and embedding faces admit with the same contract") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // containment: batch 0 admits; batch 1 plants a fragment of a
    // batch-0 doc (first ~60% of its text, past the 20-shingle floor)
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val cIdx = java.nio.file.Files
      .createTempDirectory("graft-admit-cidx").toString
    graft.analytics.ContainIndex.build(spark,
      docs.filter($"doc_id" % 5 =!= 4), cIdx)
    val delta = docs.filter($"doc_id" % 5 === 4)
      .as[IngestDoc].collect().sortBy(-_.text.length)
    val seed = delta.head
    val fragId = 990000002L
    val frag = IngestDoc(fragId,
      seed.text.take(math.max(120, (seed.text.length * 3) / 5)))
    val got = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Long)]()
    val input = MemoryStream[IngestDoc]
    val q = IngestDedup.dedupIngestContainment(input.toDS(), cIdx,
      java.nio.file.Files.createTempDirectory("graft-admit-cckpt")
        .toString, admit = true) { (pairs, _) =>
        pairs.collect().foreach(r => got.add((r.getLong(0), r.getLong(1))))
      }
    try {
      input.addData(Seq(seed)); q.processAllAvailable()
      input.addData(Seq(frag)); q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.contains((fragId, seed.doc_id)),
      s"batch 1's fragment not contained in the admitted batch-0 doc: " +
        s"${got.asScala}")
    assert(graft.analytics.ContainIndex.appliedDeltas(cIdx) ===
      Set("batch-0", "batch-1"))

    // embedding: batch 1 re-sends batch 0's vector verbatim under a new
    // id — cos 1.0 against the admitted copy
    val vecs = graft.GraftSession.table(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
    val sIdx = java.nio.file.Files
      .createTempDirectory("graft-admit-sidx").toString
    graft.analytics.SrpIndex.build(spark,
      vecs.filter($"vec_id" % 5 =!= 4), sIdx)
    val vdelta = vecs.filter($"vec_id" % 5 === 4)
      .as[IngestVec].collect().sortBy(_.vec_id)
    val vseed = vdelta.head
    val vcopy = IngestVec(990000003L, vseed.embedding)
    val vgot = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Long)]()
    val vinput = MemoryStream[IngestVec]
    val vq = IngestDedup.dedupIngestEmbeddings(vinput.toDS(), sIdx,
      java.nio.file.Files.createTempDirectory("graft-admit-sckpt")
        .toString, admit = true) { (pairs, _) =>
        pairs.collect().foreach(r => vgot.add((r.getLong(0), r.getLong(1))))
      }
    try {
      vinput.addData(Seq(vseed)); vq.processAllAvailable()
      vinput.addData(Seq(vcopy)); vq.processAllAvailable()
    } finally vq.stop()
    assert(vgot.asScala.contains((vseed.vec_id, vcopy.vec_id)),
      s"batch 1's verbatim vector copy not matched against the " +
        s"admitted batch-0 vector: ${vgot.asScala}")
    assert(graft.analytics.SrpIndex.appliedDeltas(sIdx) ===
      Set("batch-0", "batch-1"))
  }
}
