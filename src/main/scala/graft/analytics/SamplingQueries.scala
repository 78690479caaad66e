package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession.table

/** Deterministic sampling operators for training-data curation.
  *
  * Both use CONTENT HASHING (md5 of the key rendered as text), not
  * `rand()`: the sample is reproducible across reruns, engines, partition
  * layouts and cluster sizes — the property a 100 TB curation pipeline
  * needs (re-running a stage must not silently produce a different
  * dataset, and the oracle can reproduce the exact rows). The hash
  * predicate is a plain filter, so Catalyst pushes the cheap md5+compare
  * to the scan and sampling costs one pass with no shuffle beyond the
  * consumer's own.
  */
object SamplingQueries {

  /** md5-hex of the row key — identical text input ⇒ identical digest in
    * Spark and DuckDB.
    */
  private def keyHash = md5(col("event_id").cast("string"))

  /** Stratified Bernoulli sample, ~10.2% per event_type stratum
    * (first two hex digits < "1a" ⇔ 26/256): per-stratum totals, sampled
    * counts and sampled value mass in ONE pass (conditional aggregation —
    * no second scan, no join between sample and population).
    */
  def qSampleStratified(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = substring(keyHash, 1, 2) < "1a"
    table(spark, dir, "events")
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_total"),
        count(when(in, lit(1))).as("n_sample"),
        sum(when(in, $"value")).as("sum_value_sample"))
  }

  /** Deterministic fixed-k sample: the k=20 rows with the smallest
    * (md5, event_id) per stratum — a reproducible "reservoir" (hash order
    * stands in for arrival order; ties impossible once event_id joins the
    * sort key). Window top-k per group: one shuffle on the stratum key,
    * `TakeOrdered`-style in-partition selection.
    */
  def qSampleTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type")
      .orderBy(keyHash.asc, $"event_id".asc)
    table(spark, dir, "events")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 20)
      .select($"event_type", $"event_id", $"user_id",
        $"rk".cast("long").as("rk"))
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES via
    * the log-trick): per doc, u = content-hash uniform in (0,1], key =
    * ln(u)/weight, keep the top-10 keys per language — inclusion
    * probability ∝ weight (here n_chars: longer docs sampled more, the
    * quality-weighted curation draw). Content hashing keeps the draw
    * reproducible across engines/reruns/partitionings, same as the other
    * sampling ops; one shuffle on the stratum key.
    */
  def qSampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // first 8 md5 hex chars → uniform in (0,1] (4294967296 = 16^8)
    val v = expr(
      "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)")
    val key = log((v + 1L) / lit(4294967296.0)) / $"n_chars"
    val w = Window.partitionBy($"lang").orderBy(key.desc, $"doc_id".asc)
    table(spark, dir, "documents")
      .select($"doc_id", $"lang", $"n_chars")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 10)
  }

  /** UniMax language-balanced budget allocation (Chung et al., "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining"): given a character budget B (= the corpus
    * total here) and a per-language epoch cap (6/5 = 1.2 epochs, floor
    * division so arithmetic stays exact), water-fill ascending by
    * capacity — each language gets `min(cap_l, fair share of what
    * remains)`. The sequential greedy has a CLOSED FORM because with
    * ascending capacities the capped set is provably a prefix:
    * `f(i) = cap_i·(n−i+1) + prefix_i − B` is non-decreasing
    * (`f(i+1) − f(i) = (cap_{i+1} − cap_i)·(n−i) ≥ 0`), so language i is
    * capped iff `f(i) ≤ 0` with `prefix_i` the plain ascending cap prefix
    * sum — one window pass, no iteration. Everything up to the final
    * water-level division is BIGINT-exact, so Spark and DuckDB agree
    * bit-for-bit and the driver hash-checks the whole allocation.
    *
    * Scale shape: the per-language rollup is the only data-sized shuffle;
    * the water-filling itself runs on |langs| rows (the unpartitioned
    * window is over vocabulary-bounded metadata, not data — same
    * single-task-is-fine argument as `keySkewProfile`'s grand total).
    */
  def qSampleUnimax(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = table(spark, dir, "documents")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").cast("long").as("chars"))
      .withColumn("cap", expr("(6 * chars) div 5"))
    val tot = per.agg(sum($"chars").cast("long").as("budget"),
      count(lit(1)).cast("long").as("n_langs"))
    val w = Window.orderBy($"cap".asc, $"lang".asc)
    val ranked = per.crossJoin(broadcast(tot))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("pfx", coalesce(
        sum($"cap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("capped",
        $"cap" * ($"n_langs" - $"i" + 1L) <= $"budget" - $"pfx")
    val cappedAgg = ranked.agg(
      sum(when($"capped", $"cap").otherwise(0L)).cast("long").as("capped_sum"),
      sum(when($"capped", 1L).otherwise(0L)).cast("long").as("n_capped"))
    ranked.crossJoin(broadcast(cappedAgg))
      .withColumn("alloc", when($"capped", $"cap".cast("double"))
        .otherwise(($"budget" - $"capped_sum").cast("double") /
          ($"n_langs" - $"n_capped").cast("double")))
      .select($"lang", $"n_docs", $"chars", $"cap", $"capped",
        $"alloc", ($"alloc" / $"chars".cast("double")).as("epochs"))
  }

  /** Temperature-flattened domain-mixture weights over the (lang, source)
    * grid — the other standard multilingual/multi-domain mixing rule
    * (mC4/PaLM style): sampling weight ∝ p^(1/T), here T = 2 so the
    * weight is √chars — small domains are up-weighted relative to their
    * raw share, large ones down-weighted, without UniMax's hard cap
    * ([[qSampleUnimax]] is the capped alternative; a real pipeline
    * reports both and picks). The weight is QUANTIZED to
    * `floor(√chars)` as BIGINT: at corpus magnitudes the quantization is
    * sub-0.1 %, and it buys full cross-engine determinism — IEEE sqrt is
    * correctly rounded in both engines and the floor cannot flip (the
    * gap to the nearest perfect square is ≫ 1 ulp below 2^52), so every
    * sum in the query is BIGINT-exact and the only doubles are final
    * divisions of exact integers. No float-accumulation-order hazard
    * anywhere — the same design rule as [[qSampleUnimax]].
    *
    * Scale shape: one rollup shuffle on (lang, source); the mixture
    * arithmetic runs on the vocabulary-bounded domain grid.
    */
  def qSampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = table(spark, dir, "documents")
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").cast("long").as("chars"))
      .withColumn("w", floor(sqrt($"chars".cast("double"))).cast("long"))
    val tot = per.agg(sum($"chars").cast("long").as("tot_chars"),
      sum($"w").cast("long").as("tot_w"))
    per.crossJoin(broadcast(tot))
      .select($"lang", $"source", $"n_docs", $"chars", $"w",
        ($"chars".cast("double") / $"tot_chars".cast("double")).as("p_raw"),
        ($"w".cast("double") / $"tot_w".cast("double")).as("share"),
        (($"w".cast("double") / $"tot_w".cast("double")) /
          ($"chars".cast("double") / $"tot_chars".cast("double")))
          .as("boost"))
  }

  val queries: Map[String, CoreQueries.QFn] = Map(
    "q_sample_stratified" -> qSampleStratified,
    "q_sample_topk" -> qSampleTopK,
    "q_sample_weighted" -> qSampleWeighted,
    "q_sample_unimax" -> qSampleUnimax,
    "q_sample_temperature" -> qSampleTemperature
  )

  val oracles: Map[String, String] = Map(
    "q_sample_stratified" ->
      """SELECT event_type, count(*) AS n_total,
        | count(*) FILTER (substr(md5(event_id::VARCHAR), 1, 2) < '1a') AS n_sample,
        | sum(value) FILTER (substr(md5(event_id::VARCHAR), 1, 2) < '1a') AS sum_value_sample
        |FROM events GROUP BY event_type""".stripMargin,
    "q_sample_topk" ->
      """SELECT event_type, event_id, user_id, rk FROM (
        |  SELECT event_type, event_id, user_id,
        |   row_number() OVER (PARTITION BY event_type
        |     ORDER BY md5(event_id::VARCHAR) ASC, event_id ASC)::BIGINT AS rk
        |  FROM events) t
        |WHERE rk <= 20""".stripMargin,
    "q_sample_weighted" ->
      """WITH h AS (
        |  SELECT doc_id, lang, n_chars,
        |   list_reduce(list_prepend(0::BIGINT,
        |     [CASE WHEN ascii(c) >= 97 THEN ascii(c) - 87
        |           ELSE ascii(c) - 48 END::BIGINT
        |      FOR c IN string_split(substr(md5(doc_id::VARCHAR), 1, 8), '')]),
        |    (a, d) -> a * 16 + d) AS v
        |  FROM documents),
        | k AS (
        |  SELECT doc_id, lang, n_chars,
        |   ln((v + 1) / 4294967296.0) / n_chars AS key
        |  FROM h)
        |SELECT doc_id, lang, n_chars, rk FROM (
        |  SELECT doc_id, lang, n_chars,
        |   row_number() OVER (PARTITION BY lang
        |     ORDER BY key DESC, doc_id ASC)::BIGINT AS rk
        |  FROM k) t
        |WHERE rk <= 10""".stripMargin,
    "q_sample_unimax" ->
      """WITH per AS (
        |  SELECT lang, count(*)::BIGINT AS n_docs,
        |   sum(n_chars)::BIGINT AS chars,
        |   (6 * sum(n_chars)::BIGINT) // 5 AS cap
        |  FROM documents GROUP BY 1),
        | tot AS (
        |  SELECT sum(chars)::BIGINT AS budget,
        |   count(*)::BIGINT AS n_langs FROM per),
        | ranked AS (
        |  SELECT per.*, tot.budget, tot.n_langs,
        |   row_number() OVER (ORDER BY cap ASC, lang ASC)::BIGINT AS i,
        |   coalesce(sum(cap) OVER (ORDER BY cap ASC, lang ASC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |     AS pfx
        |  FROM per CROSS JOIN tot),
        | flagged AS (
        |  SELECT *, cap * (n_langs - i + 1) <= budget - pfx AS capped
        |  FROM ranked),
        | ca AS (
        |  SELECT coalesce(sum(cap) FILTER (capped), 0)::BIGINT AS capped_sum,
        |   count(*) FILTER (capped)::BIGINT AS n_capped
        |  FROM flagged)
        |SELECT lang, n_docs, chars, cap, capped,
        | CASE WHEN capped THEN cap::DOUBLE
        |      ELSE (budget - capped_sum)::DOUBLE / (n_langs - n_capped)::DOUBLE
        | END AS alloc,
        | CASE WHEN capped THEN cap::DOUBLE
        |      ELSE (budget - capped_sum)::DOUBLE / (n_langs - n_capped)::DOUBLE
        | END / chars::DOUBLE AS epochs
        |FROM flagged CROSS JOIN ca""".stripMargin,
    "q_sample_temperature" ->
      """WITH per AS (
        |  SELECT lang, source, count(*)::BIGINT AS n_docs,
        |   sum(n_chars)::BIGINT AS chars,
        |   floor(sqrt(sum(n_chars)::DOUBLE))::BIGINT AS w
        |  FROM documents GROUP BY 1, 2),
        | tot AS (
        |  SELECT sum(chars)::BIGINT AS tot_chars,
        |   sum(w)::BIGINT AS tot_w FROM per)
        |SELECT lang, source, n_docs, chars, w,
        | chars::DOUBLE / tot_chars::DOUBLE AS p_raw,
        | w::DOUBLE / tot_w::DOUBLE AS share,
        | (w::DOUBLE / tot_w::DOUBLE)
        |   / (chars::DOUBLE / tot_chars::DOUBLE) AS boost
        |FROM per CROSS JOIN tot""".stripMargin
  )
}
