package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.DedupQueries

/** The embedding ingest leg with REAL duplicate mass (r15 verdict #4):
  * the natural `vec_id % 5 == 4` delta matches the corpus 1-5 times —
  * near-vacuous — so this spec streams [[DedupQueries.plantedDelta]]'s
  * near-dup copies (exact cos ≈ 0.958, above the 0.9 production
  * threshold) through the PROBE-THEN-ADMIT loop and asserts the Wide
  * S-curve recovery bound IN THE STREAMING PATH, batch by batch:
  *
  *   1. every reported cos ≥ 0.9 pair is a planted (source, copy) pair
  *      — at this corpus's noise floor (~0.46) nothing else reaches 0.9;
  *   2. measured recall over all batches sits within ±0.2 of the
  *      per-pair S-curve model Σ [1−(1−p¹⁶)⁸]/n, p = 1 − acos(cos)/π —
  *      the same bound `SrpPlantedRecallSpec` pins for the batch face,
  *      now on the streaming probe (float-cast ingest rows perturb each
  *      cosine by ~1e-7, far inside the bound);
  *   3. the admitting loop does not dilute recall: admitted planted
  *      copies are noise-level to later planted copies (different
  *      sources), so batch N's matches still come from the standing
  *      corpus — pinned by (1) holding with `admitId` set.
  */
class IngestPlantedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed planted near-dups recover Wide S-curve recall through " +
      "the probe-then-admit loop") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)

    val vecs = graft.GraftSession.table(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
    // corpus = ALL embeddings (the planted copies' sources must stand in
    // the index), Wide production default — same build as the oracled
    // batch face qDedupEmbeddingWidePlanted
    val idx = java.nio.file.Files
      .createTempDirectory("graft-planted-sidx").toString
    graft.analytics.SrpIndex.build(spark, vecs, idx)

    // ground truth: exact cosine of every planted (source, copy) pair
    val planted = DedupQueries.plantedDelta(vecs)
      .select($"vec_id".as("new_id"),
        transform($"embedding", _.cast("double")).as("pv"))
    val src = vecs.select($"vec_id".as("corpus_id"),
      transform($"embedding", _.cast("double")).as("sv"))
    val truth = planted
      .withColumn("corpus_id", $"new_id" - DedupQueries.PlantOffset)
      .join(src, "corpus_id")
      .select($"corpus_id", $"new_id",
        (expr("graft_dot(sv, pv)") /
          (sqrt(expr("graft_dot(sv, sv)")) *
            sqrt(expr("graft_dot(pv, pv)")))).as("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(truth.nonEmpty && truth.values.forall(_ >= 0.9),
      s"fixture drift: planted pairs must all clear 0.9 " +
        s"(min ${if (truth.isEmpty) "-" else truth.values.min})")

    // the ingest rows: planted copies as Seq[Float] vectors, streamed
    // in 3 batches through the admitting loop
    val rows = DedupQueries.plantedDelta(vecs)
      .select($"vec_id",
        transform($"embedding", _.cast("float")).as("embedding"))
      .as[IngestVec].collect().sortBy(_.vec_id)
    val batches = rows.grouped((rows.length + 2) / 3).toSeq
    assert(batches.length === 3)

    val got = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Long, Long)]()  // (corpus_id, new_id, batch)
    val input = MemoryStream[IngestVec]
    val q = IngestDedup.dedupIngestEmbeddings(input.toDS(), idx,
      java.nio.file.Files.createTempDirectory("graft-planted-ck")
        .toString, admitId = Some("planted")) { (pairs, b) =>
        pairs.filter(col("cos") >= 0.9).collect()
          .foreach(r => got.add((r.getLong(0), r.getLong(1), b)))
      }
    try batches.foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    // scope to matches against the STANDING corpus (corpus_id under the
    // plant offset): once copies are admitted, a later copy of a
    // correlated source may legitimately pair with an admitted copy —
    // that's loop growth, not a recall event against the built index
    val pairs = got.asScala.collect {
      case (c, n, _) if c < DedupQueries.PlantOffset => (c, n)
    }.toSet
    assert(pairs.nonEmpty, "streamed Wide recall must be non-trivial")
    assert(pairs.subsetOf(truth.keySet),
      s"non-planted cos>=0.9 pairs from the stream: ${pairs -- truth.keySet}")
    // every batch must carry real duplicate mass, not 0-2 stragglers
    val perBatch = (0 until 3).map(b => got.asScala.count(_._3 == b))
    assert(perBatch.forall(_ >= 5),
      s"a batch probed near-vacuously: $perBatch matches per batch")

    val measured = pairs.size.toDouble / truth.size
    val modeled = truth.values.map { c =>
      val p = 1.0 - math.acos(math.min(1.0, c)) / math.Pi
      1.0 - math.pow(1.0 - math.pow(p, 16), 8)
    }.sum / truth.size
    assert(math.abs(measured - modeled) <= 0.2,
      f"streaming recall $measured%.3f vs model $modeled%.3f past 0.2 " +
        f"(n=${truth.size})")
    info(f"streamed planted recall: $measured%.3f vs model $modeled%.3f " +
      f"over ${truth.size} pairs, per-batch matches $perBatch")
    assert(graft.analytics.SrpIndex.appliedDeltas(idx) ===
      Set("planted-0", "planted-1", "planted-2"),
      "every planted batch must have been admitted")
  }
}
