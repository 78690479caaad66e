package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Value-level invariants for the corpus-statistics text operators
  * (TF-IDF / BM25 / Gopher rules) that the DuckDB oracle cannot express
  * as clearly: per-doc cardinality bounds, score-sign and ratio ranges,
  * and tie-break totality.
  */
class TextStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("tfidf emits at most 3 ranked terms per doc, ranks dense from 1") {
    val out = TextQueries.qTextTfidf(spark, dir).cache()
    val perDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("rnk").as("mn"), max("rnk").as("mx"))
    assert(perDoc.filter(col("n") > 3).count() == 0)
    assert(perDoc.filter(col("mn") =!= 1L).count() == 0)
    assert(perDoc.filter(col("mx") =!= col("n")).count() == 0)
    // a term present in every doc has idf = ln(1) = 0 — scores are never
    // negative and rank-1 is strictly positive for any doc with a
    // non-universal term
    assert(out.filter(col("score") < 0).count() == 0)
    out.unpersist()
  }

  test("bm25 scores are positive and bounded by sum of idf×(k1+1)") {
    val out = TextQueries.qTextBm25(spark, dir).cache()
    assert(out.filter(col("score_bm25") <= 0).count() == 0)
    // 3 query terms, tf-saturation bound: score < Σ idf×(k1+1) ≤ 3×ln(N)×2.2
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    val bound = 3.0 * math.log(n.toDouble) * 2.2
    assert(out.filter(col("score_bm25") >= bound).count() == 0)
    assert(out.filter(col("n_terms_hit") > 3).count() == 0)
    out.unpersist()
  }

  test("gopher fractions are ratios in [0,1] and the flag matches its terms") {
    val out = TextQueries.qTextGopher(spark, dir).cache()
    assert(out.filter(col("dup_word_frac") < 0 || col("dup_word_frac") > 1)
      .count() == 0)
    assert(out.filter(col("top_bigram_frac") <= 0 || col("top_bigram_frac") > 1)
      .count() == 0)
    val recomputed = out.filter(
      (col("dup_word_frac") <= 0.85 && col("top_bigram_frac") <= 0.2 &&
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
        col("n_words") >= 50L) =!= col("gopher_pass"))
    assert(recomputed.count() == 0)
    // one row per document — the top-bigram window must not fan out
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.count() == docs)
    out.unpersist()
  }
}
