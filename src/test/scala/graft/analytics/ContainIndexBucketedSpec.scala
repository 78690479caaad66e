package graft.analytics

import graft.SparkSpec

/** The cluster-scale containment layout ([[ContainIndex
  * .buildBucketedTables]]): the four corpus tables bucketed on their
  * probe-side join keys must (1) serve the SAME ordered pairs as the
  * directory artifact's probe, and (2) plan every corpus join with NO
  * corpus-side exchange — candidate joins on `hx` move only the delta's
  * token frames, the rarest-first ranking join reads the bucketed `df`
  * in place, and the split verify reads the bucketed `sets` in place.
  */
class ContainIndexBucketedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed containment probe: pair parity with the artifact " +
      "probe, and the corpus sets verify without an Exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = graft.GraftSession.table(spark, dir, "documents")
        .select($"doc_id", $"text")
      val corpus = docs.filter($"doc_id" % 5 =!= 4)
      val delta = docs.filter($"doc_id" % 5 === 4)
      val idx = java.nio.file.Files
        .createTempDirectory("graft-contain-bidx").toString
      ContainIndex.build(spark, corpus, idx)
      ContainIndex.buildBucketedTables(spark, corpus, "b_contain", 8)

      val bucketed = ContainIndex.probeBucketed(spark, "b_contain", delta)
      val got = bucketed.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val plain = ContainIndex.probe(spark, idx, delta)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(plain.nonEmpty, "fixture must contain cross-split pairs")
      assert(got === plain,
        "bucketed containment probe diverged from the artifact probe")

      // final adaptive plan only (the appended initial plan would
      // double-count)
      val plan = bucketed.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // the split verify's corpus-sets joins read the bucketed table in
      // place: corpus sets appear as the a-side (a_id) in one direction
      // and the b-side (b_id) in the other — NEITHER may exchange on a
      // single key fed from the corpus scan. Delta-side frames derive
      // from groupBy(doc_id) aggregations, so their verify-join inputs
      // are already doc_id-partitioned too; any single-key a_id/b_id
      // exchange would be a corpus (or regression) shuffle.
      val aExchanges = "Exchange hashpartitioning\\(a_id".r
        .findAllMatchIn(plan).length
      assert(aExchanges === 0,
        s"verify a-side exchanged — sets bucketing bought nothing:\n$plan")
      assert("Bucketed: true".r.findAllMatchIn(plan).length >= 4,
        "corpus scans (df, tokens, prefix, sets×2 directions) must " +
          s"report bucketing:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      Seq("df", "tokens", "prefix", "sets").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS b_contain_$t"))
      ()
    }
  }
}
