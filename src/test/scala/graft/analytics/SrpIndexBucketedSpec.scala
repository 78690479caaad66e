package graft.analytics

import graft.SparkSpec

/** The cluster-scale SRP layout ([[SrpIndex.buildBucketedTables]]): both
  * corpus tables bucketed on their probe-side join keys must (1) serve
  * the SAME verified pairs as the directory artifact's probe, and
  * (2) plan both corpus joins with NO corpus-side exchange — the bands
  * table's candidate equi-join moves only the delta, and the vectors
  * table's exact-cosine verify moves only the candidate rows.
  */
class SrpIndexBucketedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed SRP probe: pair parity with the artifact probe, and " +
      "both corpus tables join without an Exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val vecs = graft.GraftSession.table(spark, dir, "embeddings")
        .select($"vec_id", $"embedding")
      val corpus = vecs.filter($"vec_id" % 5 =!= 4)
      val delta = vecs.filter($"vec_id" % 5 === 4)
      val idx = java.nio.file.Files
        .createTempDirectory("graft-srp-bidx").toString
      // Narrow on BOTH faces: parity needs same-shape banding, and the
      // tiny fixture has recall only at the narrow shape — the bucketing
      // claim is layout, not shape (the default-Wide lifecycle is pinned
      // in SrpIndexSpec)
      SrpIndex.build(spark, corpus, idx, DedupQueries.Srp.Narrow)
      SrpIndex.buildBucketedTables(spark, corpus, "b_srp", 8,
        DedupQueries.Srp.Narrow)

      // the probe takes no shape: it resolves the table-recorded Narrow
      // (parity with the Narrow-built artifact proves the resolution —
      // Wide-banded deltas would match only on 64-bit collisions)
      assert(SrpIndex.bucketedShapeOf(spark, "b_srp") ===
        DedupQueries.Srp.Narrow)
      // stripped properties must fail LOUDLY, not fall back to a guess;
      // the CAPTURED property state is restored afterwards (hardcoding
      // the restore would silently re-record the wrong shape if the
      // test's build shape ever changes)
      val recorded = Bucketing.tableProps(spark, "b_srp_bands")
        .filter { case (k, _) => k.startsWith("graft.") }
      spark.sql("ALTER TABLE b_srp_bands UNSET TBLPROPERTIES " +
        "('graft.bands', 'graft.rowsPerBand')")
      val e = intercept[IllegalStateException] {
        SrpIndex.bucketedShapeOf(spark, "b_srp")
      }
      assert(e.getMessage.contains("no recorded shape"))
      Bucketing.setTableProps(spark, "b_srp_bands", recorded)
      assert(SrpIndex.bucketedShapeOf(spark, "b_srp") ===
        DedupQueries.Srp.Narrow)
      val bucketed = SrpIndex.probeBucketed(spark, "b_srp", delta)
      val got = bucketed.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val plain = SrpIndex.probe(spark, idx, delta)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(plain.nonEmpty, "fixture must contain cross-split pairs")
      assert(got === plain,
        "bucketed SRP probe diverged from the artifact probe")

      // count on the FINAL adaptive plan only — AdaptiveSparkPlan's
      // string appends the initial plan, which would double every match
      val plan = bucketed.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // candidate join: exactly one (band, bits) exchange — the delta
      // side moving to the corpus band table's bucketing
      val bandExchanges = "Exchange hashpartitioning\\(band".r
        .findAllMatchIn(plan).length
      assert(bandExchanges === 1,
        s"expected exactly 1 (band, bits) exchange (delta side), got " +
          s"$bandExchanges:\n$plan")
      // verify join: the corpus vectors scan (vec_id → id_a) reports its
      // bucketing, so the only single-key id_a exchange is the NARROW
      // candidate side; a second one would be the corpus re-shuffling
      val idAExchanges = "Exchange hashpartitioning\\(id_a#\\d+L?, \\d+\\)".r
        .findAllMatchIn(plan).length
      assert(idAExchanges === 1,
        s"expected exactly 1 single-key id_a exchange (candidates), got " +
          s"$idAExchanges:\n$plan")
      assert("Bucketed: true".r.findAllMatchIn(plan).length >= 2,
        s"both corpus scans (bands + vectors) must report bucketing:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_srp_bands")
      spark.sql("DROP TABLE IF EXISTS b_srp_vectors")
      ()
    }
  }
}
