package graft.analytics

import org.apache.spark.sql.functions.lit

import graft.SparkSpec

/** The durable-index bucketed builders size their bucket counts from
  * estimated bytes by default (the `CdcServingTable` rule via
  * [[Bucketing.sizedBuckets]]): a toy corpus builds 1-bucket tables
  * (no per-bucket commit tax where there is nothing to spread), a
  * corpus-scale build gets the power-of-two count its bytes ask for,
  * and an explicit count still wins for layout-pinning specs. This
  * retires the builders' hand-tuned `buckets = 8` defaults — the same
  * toy-scale-constant class as the r12 serving-store finding.
  */
class BucketSizingSpec extends SparkSpec {

  test("sizedBuckets: power-of-two counts covering bytes at the target") {
    assert(Bucketing.sizedBuckets(0L) === 1)
    assert(Bucketing.sizedBuckets(1L) === 1)
    assert(Bucketing.sizedBuckets(256L << 20) === 1)
    assert(Bucketing.sizedBuckets((256L << 20) + 1) === 2)
    assert(Bucketing.sizedBuckets(5L * (256L << 20)) === 8)
    assert(Bucketing.sizedBuckets(1L << 40) === 4096)
    // explicit target (the serving store passes its own)
    assert(Bucketing.sizedBuckets(1000L, targetBytes = 100L) === 16)
    // maxBuckets clamp: a 100 TB estimate wants 524 288 buckets, but a
    // bucketBy table must stay under the session's bucketing.maxBuckets
    // (default 100 000) or saveAsTable throws AFTER the build compute —
    // the clamp keeps the largest power of two under the cap
    assert(Bucketing.sizedBuckets(100L << 40, maxBuckets = 100000) === 65536)
    assert(Bucketing.sizedBuckets(100L << 40) === 524288)
    assert(Bucketing.sessionMaxBuckets(spark) === 100000)
  }

  test("auto-sized builds put a toy corpus at 1 bucket per table") {
    import spark.implicits._
    val docs = graft.GraftSession
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").filter($"doc_id" % 5 =!= 4)
    def numBuckets(table: String): String =
      spark.sql(s"DESCRIBE FORMATTED $table")
        .filter($"col_name" === "Num Buckets")
        .first().getString(1).trim
    try {
      DedupIndex.buildBucketedBands(spark, docs, "sz_bands")
      DedupIndex.buildBucketedSignatures(spark, docs, "sz_sigs")
      ContainIndex.buildBucketedTables(spark, docs, "sz_contain")
      for (t <- Seq("sz_bands", "sz_sigs", "sz_contain_tokens",
          "sz_contain_prefix", "sz_contain_sets", "sz_contain_df"))
        assert(numBuckets(t) === "1",
          s"$t: expected 1 auto-sized bucket on the toy corpus")
      // explicit count still wins
      DedupIndex.buildBucketedBands(spark, docs, "sz_bands8", 8)
      assert(numBuckets("sz_bands8") === "8")
      // empty corpus: the SRP auto-sizer reads dims from a first() —
      // zero rows must size to 1 bucket, not throw
      val noVecs = graft.GraftSession
        .table(spark, "/root/testdata/sf0.001", "embeddings")
        .select($"vec_id", $"embedding").filter(lit(false))
      SrpIndex.buildBucketedTables(spark, noVecs, "sz_srp_empty")
      assert(numBuckets("sz_srp_empty_vectors") === "1")
    } finally {
      for (t <- Seq("sz_bands", "sz_sigs", "sz_bands8", "sz_contain_tokens",
          "sz_contain_prefix", "sz_contain_sets", "sz_contain_df",
          "sz_srp_empty_vectors", "sz_srp_empty_bands"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
      ()
    }
  }
}
