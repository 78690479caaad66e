package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.table

/** Text-analysis operators for a training-data pipeline over `documents`
  * (driver mandate: language-ID, quality scoring, token counting, document
  * fingerprinting). All pure `org.apache.spark.sql.functions` — codegen'd,
  * no UDFs — so at 100 TB each is a single narrow scan-side projection with
  * column pruning (only `doc_id`/`text` read) and linear scaling across
  * executors; the only shuffles are the final small aggregations.
  */
object TextQueries {

  /** Token counting: whitespace tokens + a BPE-ish `\w+|[^\w\s]` regex
    * tokenizer (words and standalone punctuation — the usual pre-tokenizer
    * shape), plus char counts. One projection, no shuffle.
    */
  def qTextTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select(
        $"doc_id",
        size(split(trim($"text"), "\\s+")).cast("long").as("ws_tokens"),
        size(regexp_extract_all($"text", lit("\\w+|[^\\w\\s]"), lit(0)))
          .cast("long").as("bpe_tokens"),
        length($"text").cast("long").as("n_chars_calc"),
        size(array_distinct(split(trim($"text"), "\\s+")))
          .cast("long").as("distinct_ws_tokens")
      )
  }

  /** Quality scoring: length / punctuation / stopword / token-shape ratios
    * composed into one double score, then bucketed + aggregated. The score
    * arithmetic is pure double so the DuckDB oracle reproduces it exactly.
    */
  /** Per-doc quality frame (doc_id, lang, …ratios…, quality) — shared by
    * the bucketed rollup below and the quality-weighted dedup keeper
    * ([[DedupQueries.qDedupKeeperQuality]]); the score arithmetic is
    * bit-identical in DuckDB (both oracles hash-pin it), so downstream
    * argmax decisions on it are cross-engine deterministic.
    */
  private[analytics] def qualityScored(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val toks = size(split(trim($"text"), "\\s+")).cast("double")
    val chars = length($"text").cast("double")
    val stops = size(filter(split($"text", " "), w => w === "the" || w === "a"))
      .cast("double")
    val puncts = size(regexp_extract_all($"text", lit("[^\\w\\s]"), lit(0)))
      .cast("double")
    table(spark, dir, "documents")
      .select(
        $"doc_id", $"lang",
        (chars / toks).as("avg_tok_len"),
        (stops / toks).as("stop_ratio"),
        (puncts / chars).as("punct_ratio"))
      .withColumn("quality",
        ($"stop_ratio" * lit(2.0) - $"punct_ratio" * lit(5.0) +
          when($"avg_tok_len" >= 3.0 && $"avg_tok_len" <= 8.0, 1.0)
            .otherwise(0.0)))
  }

  /** The DuckDB face of [[qualityScored]] — a CTE body ending in
    * `q(doc_id, lang, quality)`, shared by both consuming oracles.
    */
  private[analytics] val duckQualityCte: String =
    """scored AS (
      |  SELECT doc_id, lang,
      |    length(text)::DOUBLE / len(regexp_split_to_array(trim(text), '\s+')) AS avg_tok_len,
      |    len(list_filter(string_split(text, ' '), w -> w = 'the' OR w = 'a'))::DOUBLE
      |      / len(regexp_split_to_array(trim(text), '\s+')) AS stop_ratio,
      |    len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE / length(text) AS punct_ratio
      |  FROM documents),
      | q AS (
      |  SELECT doc_id, lang,
      |    stop_ratio * 2.0 - punct_ratio * 5.0 +
      |      (CASE WHEN avg_tok_len >= 3.0 AND avg_tok_len <= 8.0 THEN 1.0 ELSE 0.0 END) AS quality
      |  FROM scored)""".stripMargin

  def qTextQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    qualityScored(spark, dir)
      .groupBy($"lang", (floor($"quality" * 4.0)).cast("long").as("q_bucket"))
      .agg(count(lit(1)).as("n"), sum($"quality").as("sum_quality"))
  }

  /** Language-ID by marker-token counting (the n-gram/stopword heuristic):
    * per-language marker lists scored over the whitespace tokens; predicted
    * language = argmax with a fixed tiebreak order (en > de > fr > es).
    * Exposes both scores and the prediction, plus a confusion-style rollup
    * against the labeled `lang` column.
    */
  def qTextLangId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Marker counting via explode + filter-to-markers + ONE conditional
    // aggregation: the per-marker HOF spelling (12 × `filter(toks, …)`)
    // evaluates interpreted per token per marker (measured 5.9s at sf0.1);
    // this shape is one codegen'd pass over the exploded tokens, shuffling
    // only the ~1% of tokens that are markers, then a broadcast join back
    // to the (doc_id, lang) spine for docs with zero markers.
    val markers = Map(
      "s_en" -> Seq("the", "a", "of"),
      "s_de" -> Seq("der", "und", "die"),
      "s_fr" -> Seq("le", "la", "et"),
      "s_es" -> Seq("el", "los", "y"))
    val all = markers.values.flatten.toSeq
    val docs = table(spark, dir, "documents").select($"doc_id", $"lang")
    val counts = table(spark, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter($"w".isin(all: _*))
      .groupBy($"doc_id")
      .agg(
        sum(when($"w".isin(markers("s_en"): _*), 1L).otherwise(0L)).as("s_en"),
        sum(when($"w".isin(markers("s_de"): _*), 1L).otherwise(0L)).as("s_de"),
        sum(when($"w".isin(markers("s_fr"): _*), 1L).otherwise(0L)).as("s_fr"),
        sum(when($"w".isin(markers("s_es"): _*), 1L).otherwise(0L)).as("s_es"))
    docs.join(counts, Seq("doc_id"), "left")
      .select($"doc_id", $"lang",
        coalesce($"s_en", lit(0L)).as("s_en"),
        coalesce($"s_de", lit(0L)).as("s_de"),
        coalesce($"s_fr", lit(0L)).as("s_fr"),
        coalesce($"s_es", lit(0L)).as("s_es"))
      .withColumn("predicted",
        when($"s_en" >= $"s_de" && $"s_en" >= $"s_fr" && $"s_en" >= $"s_es", "en")
          .when($"s_de" >= $"s_fr" && $"s_de" >= $"s_es", "de")
          .when($"s_fr" >= $"s_es", "fr")
          .otherwise("es"))
      .groupBy($"lang", $"predicted")
      .agg(count(lit(1)).as("n"), sum($"s_en").as("sum_s_en"))
  }

  /** CONTENT-DEFINED chunking (Rabin/FastCDC shape): chunk boundaries
    * fall where the Karp–Rabin hash of the trailing 16-char window meets
    * `h % 64 = 0` — boundaries are a function of CONTENT, not position,
    * so an insertion early in a document shifts at most the chunk it
    * lands in and every later chunk re-aligns (fixed-size chunking —
    * [[MultimodalQueries.qMmChunks]] — mis-aligns every subsequent chunk
    * instead; this is why backup/dedup systems and shift-robust corpus
    * dedup chunk by content). Per doc: boundary positions from a
    * codegen'd HOF over the char positions (the [[graft.functions
    * .PolyHash]] kernel per window — no UDF), chunks as
    * (start, boundary] spans, each fingerprinted with the 62-bit
    * two-stream polynomial (collision-negligible at corpus scale, and
    * both streams replay exactly in DuckDB). Scale shape: pure per-row
    * projection + explode — no shuffle at all; the downstream consumer
    * ([[qTextCdcChunkDup]]) shuffles on chunk fingerprint, cardinality
    * = chunk count, never pairs.
    */
  private val CdcWindow = 16

  private def cdcChunks(spark: SparkSession, dir: String): DataFrame =
    cdcChunksOf(spark, table(spark, dir, "documents"))

  /** [[cdcChunks]] over an arbitrary `(doc_id, text)` frame — the seam
    * `TextCdcSpec` uses to pin the shift-robustness property on
    * constructed shifted copies.
    */
  private[analytics] def cdcChunksOf(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val w = CdcWindow
    docs
      // ONE-pass rolling-hash kernel (graft.functions.CdcBounds) — the
      // HOF spelling (per-position substring + re-fold) is O(len·w) with
      // an allocation per position and measured 4.6 s at sf0.1; the
      // kernel's emitted positions are value-identical
      .withColumn("bpos", expr("graft_cdc_bounds(text)"))
      .withColumn("starts",
        expr("concat(array(1), transform(bpos, b -> b + 1))"))
      .withColumn("ends", expr("concat(bpos, array(length(text)))"))
      .select($"doc_id", $"text", posexplode(expr(
        "zip_with(starts, ends, (s, e) -> struct(s as cs, e as ce))")))
      .where($"col.ce" >= $"col.cs")
      .select($"doc_id", ($"pos" + 1).cast("long").as("chunk_no"),
        $"col.cs".cast("long").as("chunk_start"),
        ($"col.ce" - $"col.cs" + 1).cast("long").as("chunk_len"),
        (expr("graft_poly_hash(substring(text, col.cs, col.ce - col.cs + 1))")
          * lit(2147483629L) +
          expr("graft_poly_hash2(substring(text, col.cs, col.ce - col.cs + 1))"))
          .as("chunk_fp"))
  }

  def qTextCdcChunks(spark: SparkSession, dir: String): DataFrame =
    cdcChunks(spark, dir)

  /** Cross-doc duplicated content at CHUNK granularity over the
    * content-defined chunks — catches shared boilerplate/quotes that
    * shift position between documents (where [[MultimodalQueries
    * .qMmChunkDup]]'s fixed grid only catches aligned copies). One
    * shuffle on chunk fingerprint.
    */
  def qTextCdcChunkDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cdcChunks(spark, dir)
      .groupBy($"chunk_fp")
      .agg(countDistinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_occ"),
        min($"doc_id").as("first_doc"),
        max($"chunk_len").as("chunk_len"))
      .where($"n_docs" >= 2)
  }

  /** Document fingerprinting: polynomial rolling hash over the raw chars
    * (Karp–Rabin shape, mod 2^31-1 so both engines stay in exact integer
    * range), plus a length-bucketed fingerprint-collision rollup. The fold
    * is a codegen'd higher-order `aggregate` — no UDF, no shuffle until the
    * final tiny rollup.
    */
  def qTextFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    table(spark, dir, "documents")
      .select($"doc_id",
        // native Karp–Rabin kernel (graft.functions.PolyHash) — identical
        // fold to aggregate(split(text,''), 7L, (acc,c) -> …) but one
        // static call per row instead of a per-char interpreted lambda.
        expr("graft_poly_hash(text)").as("fp"),
        expr("length(text) div 100").cast("long").as("len_bucket"))
      .select($"doc_id", $"fp", $"len_bucket", ($"fp" % 997).as("fp_mod"))
  }

  /** Content scrubbing: word-boundary redaction of a configured term list
    * (the PII/forbidden-vocab scrub of a curation pipeline — emails/phones
    * in production; this corpus's vocabulary has no digits, so the demo
    * list is three content words). Per doc: hit count, redacted-text
    * digest, and length delta — one codegen'd projection, no shuffle; the
    * regex engines agree because the pattern stays in the common
    * Java-regex/RE2 subset (`\b`, alternation).
    */
  def qTextScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pat = "\\b(customer|value|key)\\b"
    val scrubbed = regexp_replace($"text", pat, "<X>")
    table(spark, dir, "documents")
      .select(
        $"doc_id",
        size(regexp_extract_all($"text", lit(pat), lit(0)))
          .cast("long").as("n_hits"),
        substring(sha2(scrubbed, 256), 1, 16).as("scrub_digest"),
        (length($"text") - length(scrubbed)).cast("long").as("len_delta"))
  }

  /** Sequence packing for context-window training: assign docs (in
    * deterministic doc_id order) to contiguous bins of ≤ 2048 whitespace
    * tokens — bin id = floor(tokens-before-me / 2048) — then report bin
    * fill. One running-sum window + one aggregation; the window runs over
    * a single global ordering here (the corpus is one packing stream); at
    * 100 TB you shard the stream (partitionBy(shard) in the window) and
    * pack within shards, same expressions.
    */
  def qTextPacking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    table(spark, dir, "documents")
      .select($"doc_id",
        size(split(trim($"text"), "\\s+")).cast("long").as("toks"))
      .withColumn("before", coalesce(sum($"toks").over(w), lit(0L)))
      .withColumn("bin", ($"before" / 2048L).cast("long"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("bin_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
  }

  /** TF-IDF: top-3 terms per document, score = tf × ln(N/df).
    *
    * Scale shape: one explode + shuffle on (doc_id, term) for tf, a
    * term-level shuffle join for df (NOT a broadcast — web-scale
    * vocabularies are unbounded), the corpus size N as a 1-row aggregate
    * cross-joined in (broadcast of one row, no driver-side job at plan
    * time), and a per-doc window for the top-k. Ties break on term so the
    * ranking is total; ln parity Spark↔DuckDB is within the checker's
    * 1e-9 tolerance (integer-ratio inputs keep genuine score ties exact).
    */
  def qTextTfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = table(spark, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term" =!= "")
    val tf = words.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = table(spark, dir, "documents")
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"score".desc, $"term")
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", $"tf".cast("double") * log($"n_docs" / $"df".cast("double")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 3)
      .select($"doc_id", $"term", $"rnk", $"tf", $"df", $"score")
  }

  /** BM25 (k1=1.2, b=0.75) of every document against a fixed query term
    * set — the retrieval-scoring face of the same statistics as
    * [[qTextTfidf]]. idf uses the standard
    * ln(1 + (N − df + 0.5)/(df + 0.5)) form; dl/avgdl is whitespace
    * tokens. Per-term partials shuffle once on doc_id into the final sum;
    * corpus constants (N, avgdl) ride in as 1-row broadcast aggregates.
    */
  def qTextBm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val queryTerms = Seq("spark", "query", "join")
    val k1 = 1.2
    val b = 0.75
    val docs = table(spark, dir, "documents")
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id",
        size(filter($"ws", w => w =!= "")).cast("double").as("dl"),
        $"ws")
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg($"dl").as("avgdl"))
    val tf = docs
      .select($"doc_id", $"dl", explode($"ws").as("term"))
      .filter($"term".isin(queryTerms: _*))
      .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).cast("double").as("df"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + ($"n_docs" - $"df" + 0.5) / ($"df" + 0.5)))
      .withColumn("part",
        $"idf" * $"tf" * (lit(k1) + 1.0) /
          ($"tf" + lit(k1) * (lit(1.0) - lit(b) + lit(b) * $"dl" / $"avgdl")))
      .groupBy($"doc_id")
      // column names chosen to sort AFTER doc_id: the checker orders
      // columns alphabetically and sorts rows by that tuple, so a float
      // column sorting first would pair rows across engines by a value
      // that can differ in the last ulp
      .agg(sum($"part").as("score_bm25"),
        count(lit(1)).as("n_terms_hit"),
        first($"dl").cast("long").as("n_tokens"))
  }

  /** Gopher-style repetition / quality rules per document [Rae et al.,
    * "Scaling Language Models: Methods, Analysis & Insights from Training
    * Gopher", §A1.1]: duplicate-word fraction, most-frequent-bigram
    * fraction, mean word length, and the composed keep/drop flag. All
    * ratios are integer-ratio doubles (exact in both engines). The bigram
    * top-1 is a (doc_id, bigram) shuffle + per-doc window with a total
    * tie-break; everything else is one scan-side projection.
    */
  def qTextGopher(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    gopherMetrics(table(spark, dir, "documents").select($"doc_id", $"text"))
      .withColumn("gopher_pass",
        ($"dup_word_frac" <= 0.85 && $"top_bigram_frac" <= 0.2 &&
          $"mean_word_len" >= 3.0 && $"mean_word_len" <= 10.0 &&
          $"n_words" >= 50L).cast("boolean"))
  }

  /** Per-doc Gopher metrics over a (doc_id, text) frame — shared by
    * [[qTextGopher]] and the curation pipeline
    * ([[DedupQueries.qCurationPipeline]]), which applies the same rules
    * to a filtered survivor set.
    */
  private[analytics] def gopherMetrics(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val base = docs
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", $"ws",
        size($"ws").cast("long").as("n_words"),
        size(array_distinct($"ws")).cast("long").as("n_distinct"))
    val perDoc = base.select($"doc_id", $"n_words",
      (lit(1.0) - $"n_distinct".cast("double") / $"n_words".cast("double"))
        .as("dup_word_frac"),
      (aggregate(transform($"ws", w => length(w)), lit(0L), (a, x) => a + x)
        .cast("double") / $"n_words".cast("double")).as("mean_word_len"))
    val bigrams = base
      .select($"doc_id", $"n_words", explode(expr(
        "transform(slice(ws, 1, size(ws) - 1)," +
          " (w, i) -> concat(w, ' ', element_at(ws, i + 2)))")).as("bg"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"cnt".desc, $"bg")
    val topBigram = bigrams
      .groupBy($"doc_id", $"n_words", $"bg").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" === 1)
      .select($"doc_id", $"bg".as("top_bigram"),
        ($"cnt".cast("double") / ($"n_words" - 1L).cast("double"))
          .as("top_bigram_frac"))
    perDoc.join(topBigram, "doc_id")
  }

  /** Heavy hitters (terms with ≥ 1/50 of all token mass) via count-min
    * sketch pruning + exact verification — the frequency analog of the
    * bloom-pruned join: the CMS estimate can only OVER-count, so
    * `est·50 ≥ total` keeps a SUPERSET of the true heavy hitters (no
    * false negatives), the scan-side probe drops light terms BEFORE the
    * groupBy shuffle, and the exact count of survivors restores
    * exactness. At 100 TB the sketch is 128 KiB broadcast against a
    * full-vocabulary shuffle avoided; the oracle is the plain
    * count-HAVING query. Threshold arithmetic stays in integers
    * (`n·50 ≥ total`) so both engines compare exactly.
    */
  def qTextHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.CmsFunctions.register(spark)
    val words = table(spark, dir, "documents")
      .select(explode(split($"text", " ")).as("term"))
      .filter($"term" =!= "")
    val sketch = words.agg(
      expr("graft_cms_agg(xxhash64(term), 4096, 4)").as("cms"),
      count(lit(1)).as("total"))
    words.crossJoin(broadcast(sketch))
      .filter(expr("graft_cms_min(cms, xxhash64(term), 4)") * 50L >= $"total")
      .groupBy($"term").agg(count(lit(1)).as("n"), first($"total").as("total"))
      .filter($"n" * 50L >= $"total")
      .select($"term", $"n")
  }

  /** Unigram language-model scoring: per-doc mean negative log-likelihood
    * under the corpus's own unigram distribution — the perplexity-filter
    * shape of a curation pipeline (docs scoring far from the corpus model
    * are outliers). Corpus counts are a term-level aggregation joined back
    * to the token stream on term (shuffle join — vocabulary never
    * broadcasts); the total token count rides as a 1-row broadcast. One
    * token-level shuffle each for counts and for the per-doc rollup.
    */
  def qTextUnigramNll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = table(spark, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term" =!= "")
    val counts = words.groupBy($"term").agg(count(lit(1)).as("cnt"))
    val total = words.agg(count(lit(1)).cast("double").as("total"))
    words.join(counts, "term")
      .crossJoin(broadcast(total))
      .withColumn("nll", -log($"cnt".cast("double") / $"total"))
      .groupBy($"doc_id")
      .agg(avg($"nll").as("mean_nll"), count(lit(1)).as("n_tokens"))
  }

  /** Per-doc mean NLL under an add-1-smoothed corpus BIGRAM model — the
    * next LM filter after [[qTextUnigramNll]]: conditional probability
    * P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V) catches locally-incoherent text a
    * unigram model scores as normal. Same scale shape as TF-IDF/BM25:
    * bigram and prefix counts are key-level aggregations joined back on
    * the key (shuffle joins — the bigram vocabulary NEVER broadcasts),
    * the vocabulary size rides as a 1-row broadcast. Docs under 2 words
    * are excluded identically on both sides (no bigrams exist).
    */
  def qTextBigramNll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = table(spark, dir, "documents")
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 2)
    val pairs = docs
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(ws) - 1)," +
          " i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"))
        .as("p"))
      .select($"doc_id", $"p.w1", $"p.w2")
    val cb = pairs.groupBy($"w1", $"w2").agg(count(lit(1)).as("cb"))
    val cu = pairs.groupBy($"w1").agg(count(lit(1)).as("cu"))
    val v = docs.select(explode($"ws").as("w"))
      .agg(countDistinct($"w").cast("double").as("v"))
    pairs
      .join(cb, Seq("w1", "w2"))
      .join(cu, Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("nll",
        -log(($"cb".cast("double") + 1.0) / ($"cu".cast("double") + $"v")))
      .groupBy($"doc_id")
      .agg(avg($"nll").as("mean_nll"), count(lit(1)).as("n_bigrams"))
  }

  val queries: Map[String, CoreQueries.QFn] = Map(
    "q_text_unigram_nll" -> qTextUnigramNll,
    "q_text_bigram_nll" -> qTextBigramNll,
    "q_text_heavy_hitters" -> qTextHeavyHitters,
    "q_text_tokens" -> qTextTokens,
    "q_text_quality" -> qTextQuality,
    "q_text_lang_id" -> qTextLangId,
    "q_text_fingerprint" -> qTextFingerprint,
    "q_text_cdc_chunks" -> qTextCdcChunks,
    "q_text_cdc_chunk_dup" -> qTextCdcChunkDup,
    "q_text_scrub" -> qTextScrub,
    "q_text_packing" -> qTextPacking,
    "q_text_tfidf" -> qTextTfidf,
    "q_text_bm25" -> qTextBm25,
    "q_text_gopher" -> qTextGopher
  )

  val oracles: Map[String, String] = Map(
    "q_text_bigram_nll" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        | p AS (
        |  SELECT doc_id,
        |   unnest([{'w1': ws[i], 'w2': ws[i + 1]}
        |     FOR i IN range(1, len(ws))]) AS pr
        |  FROM d),
        | pp AS (SELECT doc_id, pr.w1 AS w1, pr.w2 AS w2 FROM p),
        | cb AS (SELECT w1, w2, count(*) AS cb FROM pp GROUP BY 1, 2),
        | cu AS (SELECT w1, count(*) AS cu FROM pp GROUP BY 1),
        | v AS (
        |  SELECT count(DISTINCT w)::DOUBLE AS v
        |  FROM (SELECT unnest(ws) AS w FROM d))
        |SELECT pp.doc_id, avg(-ln((cb.cb + 1.0) / (cu.cu + v.v))) AS mean_nll,
        | count(*)::BIGINT AS n_bigrams
        |FROM pp JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
        |GROUP BY 1""".stripMargin,
    "q_text_unigram_nll" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | w AS (SELECT doc_id, term FROM words WHERE term <> ''),
        | counts AS (SELECT term, count(*)::BIGINT AS cnt FROM w GROUP BY 1),
        | total AS (SELECT count(*)::DOUBLE AS total FROM w)
        |SELECT doc_id, avg(-ln(cnt::DOUBLE / total)) AS mean_nll,
        | count(*) AS n_tokens
        |FROM w JOIN counts USING (term) CROSS JOIN total
        |GROUP BY 1""".stripMargin,
    "q_text_heavy_hitters" ->
      """WITH words AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        | w AS (SELECT term FROM words WHERE term <> ''),
        | total AS (SELECT count(*)::BIGINT AS total FROM w)
        |SELECT term, count(*)::BIGINT AS n
        |FROM w CROSS JOIN total
        |GROUP BY term, total.total
        |HAVING count(*) * 50 >= total.total""".stripMargin,
    "q_text_tokens" ->
      """SELECT doc_id,
        | len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS ws_tokens,
        | len(regexp_extract_all(text, '\w+|[^\w\s]'))::BIGINT AS bpe_tokens,
        | length(text)::BIGINT AS n_chars_calc,
        | len(list_distinct(regexp_split_to_array(trim(text), '\s+')))::BIGINT AS distinct_ws_tokens
        |FROM documents""".stripMargin,
    "q_text_quality" ->
      s"""WITH $duckQualityCte
        |SELECT lang, floor(quality * 4.0)::BIGINT AS q_bucket,
        | count(*) AS n, sum(quality) AS sum_quality
        |FROM q GROUP BY 1, 2""".stripMargin,
    "q_text_lang_id" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    (len(list_filter(string_split(text,' '), w -> w='the'))
        |     + len(list_filter(string_split(text,' '), w -> w='a'))
        |     + len(list_filter(string_split(text,' '), w -> w='of')))::BIGINT AS s_en,
        |    (len(list_filter(string_split(text,' '), w -> w='der'))
        |     + len(list_filter(string_split(text,' '), w -> w='und'))
        |     + len(list_filter(string_split(text,' '), w -> w='die')))::BIGINT AS s_de,
        |    (len(list_filter(string_split(text,' '), w -> w='le'))
        |     + len(list_filter(string_split(text,' '), w -> w='la'))
        |     + len(list_filter(string_split(text,' '), w -> w='et')))::BIGINT AS s_fr,
        |    (len(list_filter(string_split(text,' '), w -> w='el'))
        |     + len(list_filter(string_split(text,' '), w -> w='los'))
        |     + len(list_filter(string_split(text,' '), w -> w='y')))::BIGINT AS s_es
        |  FROM documents)
        |SELECT lang,
        | CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |      WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |      WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS predicted,
        | count(*) AS n, sum(s_en)::BIGINT AS sum_s_en
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q_text_fingerprint" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(7::BIGINT,
        |        [ascii(c)::BIGINT FOR c IN string_split(text, '')]),
        |      (acc, c) -> (acc * 31 + c) % 2147483647) AS fp,
        |    (length(text) // 100)::BIGINT AS len_bucket
        |  FROM documents)
        |SELECT doc_id, fp, len_bucket, fp % 997 AS fp_mod FROM fp""".stripMargin,
    "q_text_cdc_chunks" ->
      """WITH d AS (SELECT doc_id, text, length(text)::BIGINT AS len FROM documents),
        | b AS MATERIALIZED (
        |  SELECT doc_id, text, len,
        |   [i FOR i IN range(16::BIGINT, greatest(len, 16::BIGINT) + 1)
        |    IF i <= len AND list_reduce(list_prepend(7::BIGINT,
        |        [ascii(c)::BIGINT FOR c IN
        |         string_split(substr(text, (i - 15)::INT, 16), '')]),
        |      (acc, c) -> (acc * 31 + c) % 2147483647) % 64 = 0] AS bpos
        |  FROM d),
        | c AS (
        |  SELECT doc_id, text,
        |   list_prepend(1::BIGINT, [p + 1 FOR p IN bpos]) AS starts,
        |   list_append(bpos, len) AS ends
        |  FROM b),
        | e AS (
        |  SELECT doc_id, text, starts, ends,
        |   unnest(range(1, len(starts) + 1)) AS i
        |  FROM c),
        | ch AS MATERIALIZED (
        |  SELECT doc_id, i::BIGINT AS chunk_no, starts[i]::BIGINT AS chunk_start,
        |   (ends[i] - starts[i] + 1)::BIGINT AS chunk_len,
        |   substr(text, starts[i]::INT, (ends[i] - starts[i] + 1)::INT) AS chunk
        |  FROM e WHERE ends[i] >= starts[i]),
        | fp AS (
        |  SELECT doc_id, chunk_no, chunk_start, chunk_len,
        |   list_reduce(list_prepend(7::BIGINT,
        |       [ascii(c)::BIGINT FOR c IN string_split(chunk, '')]),
        |     (acc, c) -> (acc * 31 + c) % 2147483647) * 2147483629
        |   + list_reduce(list_prepend(11::BIGINT,
        |       [ascii(c)::BIGINT FOR c IN string_split(chunk, '')]),
        |     (acc, c) -> (acc * 31 + c) % 2147483629) AS chunk_fp
        |  FROM ch)
        |SELECT doc_id, chunk_no, chunk_start, chunk_len, chunk_fp
        |FROM fp""".stripMargin,
    "q_text_cdc_chunk_dup" ->
      """WITH d AS (SELECT doc_id, text, length(text)::BIGINT AS len FROM documents),
        | b AS MATERIALIZED (
        |  SELECT doc_id, text, len,
        |   [i FOR i IN range(16::BIGINT, greatest(len, 16::BIGINT) + 1)
        |    IF i <= len AND list_reduce(list_prepend(7::BIGINT,
        |        [ascii(c)::BIGINT FOR c IN
        |         string_split(substr(text, (i - 15)::INT, 16), '')]),
        |      (acc, c) -> (acc * 31 + c) % 2147483647) % 64 = 0] AS bpos
        |  FROM d),
        | c AS (
        |  SELECT doc_id, text,
        |   list_prepend(1::BIGINT, [p + 1 FOR p IN bpos]) AS starts,
        |   list_append(bpos, len) AS ends
        |  FROM b),
        | e AS (
        |  SELECT doc_id, text, starts, ends,
        |   unnest(range(1, len(starts) + 1)) AS i
        |  FROM c),
        | ch AS MATERIALIZED (
        |  SELECT doc_id, i::BIGINT AS chunk_no, starts[i]::BIGINT AS chunk_start,
        |   (ends[i] - starts[i] + 1)::BIGINT AS chunk_len,
        |   substr(text, starts[i]::INT, (ends[i] - starts[i] + 1)::INT) AS chunk
        |  FROM e WHERE ends[i] >= starts[i]),
        | fp AS (
        |  SELECT doc_id, chunk_no, chunk_start, chunk_len,
        |   list_reduce(list_prepend(7::BIGINT,
        |       [ascii(c)::BIGINT FOR c IN string_split(chunk, '')]),
        |     (acc, c) -> (acc * 31 + c) % 2147483647) * 2147483629
        |   + list_reduce(list_prepend(11::BIGINT,
        |       [ascii(c)::BIGINT FOR c IN string_split(chunk, '')]),
        |     (acc, c) -> (acc * 31 + c) % 2147483629) AS chunk_fp
        |  FROM ch)
        |SELECT chunk_fp, count(DISTINCT doc_id) AS n_docs,
        | count(*) AS n_occ, min(doc_id) AS first_doc,
        | max(chunk_len) AS chunk_len
        |FROM fp GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2""".stripMargin,
    "q_text_scrub" ->
      """SELECT doc_id,
        | len(regexp_extract_all(text, '\b(customer|value|key)\b'))::BIGINT AS n_hits,
        | substr(sha256(regexp_replace(text, '\b(customer|value|key)\b', '<X>', 'g')), 1, 16) AS scrub_digest,
        | (length(text) - length(regexp_replace(text, '\b(customer|value|key)\b', '<X>', 'g')))::BIGINT AS len_delta
        |FROM documents""".stripMargin,
    "q_text_packing" ->
      """WITH t AS (
        |  SELECT doc_id,
        |   len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS toks
        |  FROM documents),
        | p AS (
        |  SELECT doc_id, toks,
        |   coalesce(sum(toks) OVER (ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |  FROM t)
        |SELECT (before // 2048)::BIGINT AS bin, count(*) AS n_docs,
        | sum(toks)::BIGINT AS bin_tokens,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY 1""".stripMargin,
    "q_text_tfidf" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | tf AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf
        |  FROM words WHERE term <> '' GROUP BY 1, 2),
        | dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        | n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
        | scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |   tf.tf::DOUBLE * ln(n.n_docs / dfreq.df::DOUBLE) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id, term,
        | row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk,
        | tf, df, score
        |FROM scored QUALIFY rnk <= 3""".stripMargin,
    "q_text_bm25" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |   len(list_filter(string_split(text, ' '), w -> w <> ''))::DOUBLE AS dl,
        |   string_split(text, ' ') AS ws
        |  FROM documents),
        | stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM docs),
        | tf AS (
        |  SELECT doc_id, dl, term, count(*)::DOUBLE AS tf
        |  FROM (SELECT doc_id, dl, unnest(ws) AS term FROM docs)
        |  WHERE term IN ('spark', 'query', 'join') GROUP BY 1, 2, 3),
        | dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
        | parts AS (
        |  SELECT tf.doc_id, tf.dl,
        |   ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
        |     * tf.tf * (1.2 + 1.0)
        |     / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / stats.avgdl)) AS part
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats)
        |SELECT doc_id, sum(part) AS score_bm25, count(*) AS n_terms_hit,
        | min(dl)::BIGINT AS n_tokens
        |FROM parts GROUP BY 1""".stripMargin,
    "q_text_gopher" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws,
        |   len(string_split(text, ' '))::BIGINT AS n_words,
        |   len(list_distinct(string_split(text, ' ')))::BIGINT AS n_distinct
        |  FROM documents),
        | per_doc AS (
        |  SELECT doc_id, n_words,
        |   1.0 - n_distinct::DOUBLE / n_words::DOUBLE AS dup_word_frac,
        |   list_sum([length(w) FOR w IN ws])::DOUBLE / n_words::DOUBLE AS mean_word_len
        |  FROM base),
        | bg AS (
        |  SELECT doc_id, n_words,
        |   unnest([ws[i] || ' ' || ws[i + 1] FOR i IN range(1, len(ws))]) AS bg
        |  FROM base),
        | top_bg AS (
        |  SELECT doc_id, bg AS top_bigram,
        |   cnt::DOUBLE / (n_words - 1)::DOUBLE AS top_bigram_frac
        |  FROM (
        |   SELECT doc_id, n_words, bg, count(*)::BIGINT AS cnt,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, bg) AS rnk
        |   FROM bg GROUP BY 1, 2, 3)
        |  WHERE rnk = 1)
        |SELECT p.doc_id, p.n_words, p.dup_word_frac, p.mean_word_len,
        | t.top_bigram, t.top_bigram_frac,
        | (p.dup_word_frac <= 0.85 AND t.top_bigram_frac <= 0.2 AND
        |  p.mean_word_len >= 3.0 AND p.mean_word_len <= 10.0 AND
        |  p.n_words >= 50) AS gopher_pass
        |FROM per_doc p JOIN top_bg t ON p.doc_id = t.doc_id""".stripMargin
  )
}
