package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The cluster-scale band layout ([[DedupIndex.buildBucketedBands]]):
  * the corpus band table bucketed on the probe's join key must (1) serve
  * the SAME verified pairs as the directory artifact's probe, and
  * (2) plan the candidate join with NO corpus-side exchange — the
  * write-once bucket shuffle replaces the per-probe one, which at 100 TB
  * is the difference between moving the standing index per probe and
  * moving the delta only.
  */
class DedupIndexBucketedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed band probe: pair parity with the artifact probe, and " +
      "the corpus side joins without an Exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = graft.GraftSession.table(spark, dir, "documents")
        .select($"doc_id", $"text")
      val corpus = docs.filter($"doc_id" % 5 =!= 4)
      val delta = docs.filter($"doc_id" % 5 === 4)
      val idx = java.nio.file.Files
        .createTempDirectory("graft-dedup-bidx").toString
      DedupIndex.build(spark, corpus, idx)
      DedupIndex.buildBucketedBands(spark, corpus, "b_dedup_bands", 8)

      val corpusPer = spark.read.parquet(
        DedupIndex.tablePath(idx, "signatures"))
      val bucketed = DedupIndex
        .probeBucketed(spark, "b_dedup_bands", corpusPer, delta)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plain = DedupIndex.probe(spark, idx, delta)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(plain.nonEmpty, "fixture must contain cross-split pairs")
      assert(bucketed === plain,
        "bucketed band probe diverged from the artifact probe")

      // plan shape of the raw candidate join (pre-distinct): exactly ONE
      // exchange — the delta side shuffling to the corpus's bucketing;
      // a corpus-side Exchange would mean the layout bought nothing
      val cand = DedupIndex.bucketedCandidates(spark, "b_dedup_bands",
        DedupQueries.signaturesOf(delta,
          DedupIndex.Shape.Corpus.slots))
      cand.count()
      val plan = cand.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the delta signature derivation legitimately exchanges on doc_id
      // internally; the claim is about the JOIN key — exactly one
      // (band, sig) exchange in the whole plan = the delta side moving to
      // the corpus's bucketing, corpus side read in place
      val bandExchanges = "Exchange hashpartitioning\\(band".r
        .findAllMatchIn(plan).length
      assert(bandExchanges === 1,
        s"expected exactly 1 (band, sig) exchange (delta side), got " +
          s"$bandExchanges:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"corpus band scan must report its bucketing:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_dedup_bands")
      ()
    }
  }

  test("bucketed SIGNATURE table: verify-side pair parity, and the " +
      "corpus sets join the candidates without an Exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = graft.GraftSession.table(spark, dir, "documents")
        .select($"doc_id", $"text")
      val corpus = docs.filter($"doc_id" % 5 =!= 4)
      val delta = docs.filter($"doc_id" % 5 === 4)
      val idx = java.nio.file.Files
        .createTempDirectory("graft-dedup-bsig").toString
      DedupIndex.build(spark, corpus, idx)
      DedupIndex.buildBucketedBands(spark, corpus, "b_dedup_bands2", 8)
      DedupIndex.buildBucketedSignatures(spark, corpus, "b_dedup_sigs", 8)

      // parity: the fully-bucketed probe (bands AND signatures from
      // managed tables) equals the directory artifact's probe
      val bucketed = DedupIndex.probeBucketed(spark, "b_dedup_bands2",
        spark.table("b_dedup_sigs"), delta)
      val got = bucketed.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val plain = DedupIndex.probe(spark, idx, delta)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(plain.nonEmpty, "fixture must contain cross-split pairs")
      assert(got === plain,
        "bucketed-signature probe diverged from the artifact probe")

      // plan shape: the verify's corpus-sets join must read the bucketed
      // signature table IN PLACE — the a-side (corpus, a_id = doc_id)
      // reports its bucket partitioning, so the only single-key exchange
      // on that join is the NARROW candidate side (id_a). A corpus-side
      // exchange would surface as `Exchange hashpartitioning(a_id…)`.
      // final adaptive plan only (the appended initial plan would
      // double-count)
      val plan = bucketed.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!"Exchange hashpartitioning\\(a_id".r
        .findAllMatchIn(plan).hasNext,
        s"corpus signature side exchanged — bucketing bought nothing:\n$plan")
      assert("Bucketed: true".r.findAllMatchIn(plan).length >= 2,
        s"both corpus scans (bands + signatures) must report bucketing:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_dedup_bands2")
      spark.sql("DROP TABLE IF EXISTS b_dedup_sigs")
      ()
    }
  }

  test("band shape rides the TABLE's properties: a probe replays the " +
      "build shape, never a caller guess") {
    import spark.implicits._
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val corpus = docs.filter($"doc_id" % 5 =!= 4)
    val delta = docs.filter($"doc_id" % 5 === 4)
    try {
      // build at the NON-default Oracle shape; the probe takes no shape
      // argument, so parity with an Oracle-shaped artifact proves it
      // resolved the recorded shape (a Corpus-banded delta against
      // Oracle-banded corpus sigs matches only on 64-bit collisions)
      DedupIndex.buildBucketedBands(spark, corpus, "b_shape_bands", 4,
        DedupIndex.Shape.Oracle)
      assert(DedupIndex.bucketedShapeOf(spark, "b_shape_bands") ===
        DedupIndex.Shape.Oracle)
      val idx = java.nio.file.Files
        .createTempDirectory("graft-dedup-shape").toString
      DedupIndex.build(spark, corpus, idx, DedupIndex.Shape.Oracle)
      val corpusPer = spark.read.parquet(
        DedupIndex.tablePath(idx, "signatures"))
      val bucketed = DedupIndex
        .probeBucketed(spark, "b_shape_bands", corpusPer, delta)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plain = DedupIndex.probe(spark, idx, delta)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(plain.nonEmpty, "fixture must contain cross-split pairs")
      assert(bucketed === plain,
        "probe did not replay the table's recorded Oracle shape")
      // a table WITHOUT recorded properties (pre-metadata build, or a
      // build that crashed between saveAsTable and the property write)
      // must fail LOUDLY — any guessed default silently near-empties
      // the probe for tables built at the other shape
      spark.sql("ALTER TABLE b_shape_bands UNSET TBLPROPERTIES " +
        "('graft.bands', 'graft.rowsPerBand', 'graft.slots')")
      val e = intercept[IllegalStateException] {
        DedupIndex.bucketedShapeOf(spark, "b_shape_bands")
      }
      assert(e.getMessage.contains("no recorded shape"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_shape_bands")
      ()
    }
  }
}
