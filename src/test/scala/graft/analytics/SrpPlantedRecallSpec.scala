package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Wide S-curve RECOVERY claim, measured against its own model
  * (r13 verdict #4): [[DedupQueries.qDedupEmbeddingWidePlanted]] plants
  * near-dup copies at exact cos ≈ 0.958 — above the 0.9 production
  * threshold — and probes them through a Wide-default SrpIndex artifact.
  * Pinned: (1) every reported pair is a planted pair at cos ≥ 0.9 (at
  * this corpus's noise floor nothing else can reach 0.9); (2) measured
  * recall is NON-TRIVIAL (the same 8×16 banding whose recall at the
  * noise-floor cos ≥ 0.46 is ~0 — `q_dedup_embedding_lsh64`'s honest
  * row — recovers where duplicate mass actually lives); (3) measured
  * recall sits within ±0.2 of the per-pair S-curve model
  * Σ [1−(1−p¹⁶)⁸] / n with p = 1 − acos(cos)/π — the claim is the
  * MODEL, not a lucky constant, so the bound rides each fixture's own
  * planted cosines rather than a hard-coded 0.85.
  */
class SrpPlantedRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("planted Wide face: matches are planted pairs, recall within " +
      "0.2 of the S-curve model") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-planted").toString
    sys.props("graft.ann.index.dir") = root
    try {
      val vecs = graft.GraftSession.table(spark, dir, "embeddings")
        .select($"vec_id", $"embedding")
      graft.functions.VectorFunctions.register(spark)

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
      assert(truth.nonEmpty, "fixture must yield planted pairs")
      val qualifying = truth.filter(_._2 >= 0.9)
      assert(qualifying.size === truth.size,
        s"the ±0.3 wobble left pairs under the 0.9 threshold: " +
          s"${truth.values.min} — tighten PlantWobble")

      val got = DedupQueries.qDedupEmbeddingWidePlanted(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.nonEmpty, "Wide recall at cos≈0.958 must be non-trivial")
      assert(got.subsetOf(qualifying.keySet),
        s"non-planted pairs reported: ${got -- qualifying.keySet}")

      val measured = got.size.toDouble / qualifying.size
      val modeled = qualifying.values.map { c =>
        val p = 1.0 - math.acos(math.min(1.0, c)) / math.Pi
        1.0 - math.pow(1.0 - math.pow(p, 16), 8)
      }.sum / qualifying.size
      assert(math.abs(measured - modeled) <= 0.2,
        f"measured recall $measured%.3f vs modeled $modeled%.3f " +
          f"diverges past 0.2 (n=${qualifying.size})")
      info(f"planted Wide recall: measured $measured%.3f vs modeled " +
        f"$modeled%.3f over ${qualifying.size} pairs")
    } finally { sys.props.remove("graft.ann.index.dir"); () }
  }
}
