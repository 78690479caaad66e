package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession.table

/** Dataset-assembly operators — the steps between "curated corpus" and
  * "training run": deterministic split assignment, size-balanced
  * sharding, benchmark decontamination, plus activity-pattern and
  * function-surface operators (gaps-and-islands, char entropy, map and
  * regex functions).
  *
  * Design rules shared with the rest of the suite: content hashing (md5)
  * instead of `rand()` so every assignment is reproducible across
  * engines, reruns and cluster sizes; scan-side projection wherever
  * possible; no UDFs; every query carries an exact DuckDB oracle.
  */
object PipelineQueries {

  /** Deterministic train/val/test split (~90/5/5 by md5 of the doc key),
    * reported per (lang, split) with document and byte totals. The split
    * predicate is a pure scan-side expression — assignment costs zero
    * shuffles beyond the report's own aggregate, and a re-run on any
    * cluster reproduces the exact same membership (the property that
    * makes eval sets stable under pipeline re-execution). First-2-hex
    * thresholds: < "e6" (230/256) train, < "f3" (243/256) val, else
    * test.
    */
  def qSplitAssign(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = substring(md5($"doc_id".cast("string")), 1, 2)
    table(spark, dir, "documents")
      .select($"doc_id", $"lang", $"n_chars",
        when(h < "e6", "train").when(h < "f3", "val").otherwise("test")
          .as("split"))
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").cast("long").as("sum_chars"))
  }

  /** Size-balanced shard assignment: rank docs by size desc, deal
    * round-robin into 8 shards (longest-processing-time-first — shard
    * totals differ by at most one max-size doc). The global rank is
    * computed the DISTRIBUTED way: `repartitionByRange` on the sort key,
    * per-partition `row_number`, then a broadcast of per-partition
    * counts-turned-offsets — the two-phase rank idiom. A plain
    * `Window.orderBy` with no partition key would funnel the entire
    * corpus through ONE task; here the only single-task step is the
    * prefix sum over `numPartitions` count rows (constant-size metadata,
    * not data).
    */
  def qShardBalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parted = table(spark, dir, "documents")
      .select($"doc_id", $"n_chars")
      .repartitionByRange(16, $"n_chars".desc, $"doc_id".asc)
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy($"pid")
      .orderBy($"n_chars".desc, $"doc_id".asc)
    // offsets: per-partition counts → exclusive prefix sum. 16 rows —
    // the single-partition window runs on metadata, never on the corpus.
    val wOff = Window.orderBy($"pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy($"pid").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum($"cnt").over(wOff), lit(0L)))
      .select($"pid", $"off")
    parted
      .withColumn("lrk", row_number().over(wLocal))
      .join(broadcast(offsets), "pid")
      .withColumn("shard", pmod($"off" + $"lrk" - 1L, lit(8L)))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").cast("long").as("sum_chars"),
        max($"n_chars").cast("long").as("max_chars"),
        min($"n_chars").cast("long").as("min_chars"))
  }

  /** Word-3-gram shingles of `text` (pre-split into `ws`), guarded so a
    * short doc still yields one (possibly shorter) shingle — the oracle
    * mirrors the guard exactly.
    */
  private val wordShingleExpr =
    "transform(sequence(1, greatest(size(ws) - 2, 1))," +
      " i -> concat_ws(' ', slice(ws, i, 3)))"

  /** Benchmark decontamination: flag training docs sharing any word-3-gram
    * with the held-out eval set (`doc_id % 97 = 0` stands in for the
    * benchmark membership list). The eval shingle set is BROADCAST —
    * benchmarks are bounded (thousands of docs) no matter how large the
    * training corpus grows, so the contamination probe is a map-side
    * semi-join against the full-corpus shingle explode: one pass over
    * training text, no corpus-side shuffle on shingles.
    */
  def qTextContamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = table(spark, dir, "documents")
      .select($"doc_id", $"lang", split($"text", " ").as("ws"))
      .repartition($"doc_id")
    val sh = base.select($"doc_id", explode(expr(wordShingleExpr)).as("sh"))
    val evalSh = sh.filter($"doc_id" % 97 === 0).select($"sh").distinct()
    val contam = sh.filter($"doc_id" % 97 =!= 0)
      .join(broadcast(evalSh), "sh")
      .select($"doc_id").distinct()
      .withColumn("hit", lit(true))
    base.filter($"doc_id" % 97 =!= 0)
      .join(contam, Seq("doc_id"), "left")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_train"), count($"hit").as("n_contaminated"))
  }

  /** Gaps-and-islands over per-user activity days: consecutive-day runs
    * collapse to one island via the classic `day − row_number` constant;
    * per user: island count, longest streak, active days. One shuffle on
    * user_id, then linear in-partition window work — the same scale shape
    * as sessionization.
    */
  def qGapsIslands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"day")
    table(spark, dir, "events")
      .select($"user_id", to_date($"ts").as("day")).distinct()
      .withColumn("grp",
        datediff($"day", lit("1970-01-01").cast("date")) -
          row_number().over(w))
      .groupBy($"user_id", $"grp").agg(count(lit(1)).as("len"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_islands"),
        max($"len").as("max_len"),
        sum($"len").cast("long").as("n_active_days"))
  }

  /** Per-doc character entropy — the cheap "is this text degenerate"
    * signal (binary junk ≈ uniform ⇒ high; repeated filler ⇒ low).
    * H = log2(n) − (Σ c·log2 c)/n so one grouped aggregate after the
    * char explode suffices (no join between per-char counts and the doc
    * total). Explode fans out partition-local after a repartition on
    * doc_id, which also pre-clusters both groupBys.
    */
  def qTextEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    entropyOf(table(spark, dir, "documents")
      .select($"doc_id", $"text")
      .repartition($"doc_id"))
  }

  /** Char entropy of a (doc_id, text) frame — split out so the spec can
    * drive the PRODUCTION operator on literal fixtures (uniform text →
    * log2(alphabet), constant text → 0).
    */
  private[analytics] def entropyOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", explode(split($"text", "")).as("ch"))
      .groupBy($"doc_id", $"ch")
      .agg(count(lit(1)).cast("double").as("c"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_distinct_chars"),
        sum($"c").as("n"),
        sum($"c" * log2($"c")).as("slc"))
      .select($"doc_id", $"n_distinct_chars",
        (log2($"n") - $"slc" / $"n").as("entropy"))
  }

  /** Map-typed column surface: per-order linenumber→quantity map built
    * with `map_from_entries` (entries sorted so map_values order is
    * deterministic), consumed via `element_at` / `map_filter` /
    * `map_values` — all codegen'd map expressions, zero UDFs. The oracle
    * computes the same scalars with conditional aggregates (the map is
    * the API surface under test; the VALUES are engine-comparable).
    */
  def qMapFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "lineitem")
      // the fixture carries duplicate (orderkey, linenumber) rows —
      // pre-aggregate so the map build sees unique keys (map_from_entries
      // rejects duplicates under spark.sql.mapKeyDedupPolicy=EXCEPTION)
      .groupBy($"l_orderkey", $"l_linenumber")
      .agg(sum($"l_quantity".cast("double")).as("qty"))
      .groupBy($"l_orderkey")
      .agg(map_from_entries(
        sort_array(collect_list(struct($"l_linenumber", $"qty")))).as("m"))
      .select($"l_orderkey",
        size($"m").cast("long").as("n_lines"),
        element_at($"m", 1).as("qty_first"),
        expr("aggregate(map_values(m), 0.0d, (a, x) -> a + x)").as("sum_qty"),
        expr("cast(size(map_filter(m, (k, v) -> v > 25.0d)) as bigint)")
          .as("n_big"))
  }

  /** Regex function surface over document text: `regexp_extract_all`
    * count, first long word, vowel-stripped length. Pure scan-side
    * projection (pushdown-friendly); patterns stay in the
    * character-class subset where Java regex and RE2 agree.
    */
  def qRegexFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select($"doc_id",
        expr("cast(size(regexp_extract_all(text, '([a-z]{6,})', 1)) as bigint)")
          .as("n_long"),
        regexp_extract($"text", "([a-z]{6,})", 1).as("first_long"),
        length(regexp_replace($"text", "[aeiou]", "")).cast("long")
          .as("n_novowel"))
  }

  /** The salted skew join on the DRIVER-CHECKED surface: lineitem ⋈
    * orders on orderkey with the lineitem side scattered over 8 salt
    * buckets and the orders side replicated into them
    * ([[SkewUtils.saltedJoin]]) — result-identical to the plain join by
    * construction (the oracle IS the plain join), while the hot key's
    * rows spread across 8 reducers instead of stalling one. The rollup
    * keys on o_orderpriority so the output is tiny and exact.
    *
    * The revenue sum runs over DECIMAL(18,2), not double: the salted
    * shuffle-hash plan accumulates each group's rows in a different
    * order than the oracle's plain join, and float addition is not
    * associative — round 5's double sum drifted in the last ulps and
    * failed the strict hash compare. TPC-H prices are exact 2-dp
    * decimals, so the decimal sum is order-independent and exact; the
    * result casts back to double (exact for these magnitudes) so the
    * output schema stays the conventional one.
    */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = table(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice")
    val ord = table(spark, dir, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    SkewUtils.saltedJoin(li, ord, "l_orderkey", saltBuckets = 8)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double")
          .as("revenue"))
  }

  val queries: Map[String, CoreQueries.QFn] = Map(
    "q_salted_join" -> qSaltedJoin,
    "q_split_assign" -> qSplitAssign,
    "q_shard_balance" -> qShardBalance,
    "q_text_contamination" -> qTextContamination,
    "q_gaps_islands" -> qGapsIslands,
    "q_text_entropy" -> qTextEntropy,
    "q_map_funcs" -> qMapFuncs,
    "q_regex_funcs" -> qRegexFuncs
  )

  val oracles: Map[String, String] = Map(
    "q_salted_join" ->
      """SELECT o_orderpriority,
        | count(*)::BIGINT AS n_items,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |   AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,
    "q_split_assign" ->
      """SELECT lang,
        | CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'e6' THEN 'train'
        |      WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'f3' THEN 'val'
        |      ELSE 'test' END AS split,
        | count(*)::BIGINT AS n_docs,
        | sum(n_chars)::BIGINT AS sum_chars
        |FROM documents GROUP BY 1, 2""".stripMargin,
    "q_shard_balance" ->
      """WITH r AS (
        |  SELECT n_chars,
        |   row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS rk
        |  FROM documents)
        |SELECT (rk % 8)::BIGINT AS shard,
        | count(*)::BIGINT AS n_docs,
        | sum(n_chars)::BIGINT AS sum_chars,
        | max(n_chars)::BIGINT AS max_chars,
        | min(n_chars)::BIGINT AS min_chars
        |FROM r GROUP BY 1""".stripMargin,
    "q_text_contamination" ->
      """WITH w AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
        | sh AS (
        |  SELECT doc_id, unnest([array_to_string(ws[i:i+2], ' ')
        |    FOR i IN range(1, greatest(len(ws) - 2, 1) + 1)]) AS sh
        |  FROM w),
        | ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
        | hits AS (
        |  SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (sh)
        |  WHERE s.doc_id % 97 <> 0)
        |SELECT w.lang, count(*)::BIGINT AS n_train,
        | count(h.doc_id)::BIGINT AS n_contaminated
        |FROM w LEFT JOIN hits h ON w.doc_id = h.doc_id
        |WHERE w.doc_id % 97 <> 0
        |GROUP BY 1""".stripMargin,
    "q_gaps_islands" ->
      """WITH d AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        | r AS (
        |  SELECT user_id, day,
        |   row_number() OVER (PARTITION BY user_id ORDER BY day) AS rk
        |  FROM d),
        | g AS (SELECT user_id, (day - DATE '1970-01-01') - rk AS grp FROM r),
        | c AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, count(*)::BIGINT AS n_islands,
        | max(len)::BIGINT AS max_len, sum(len)::BIGINT AS n_active_days
        |FROM c GROUP BY 1""".stripMargin,
    "q_text_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id,
        |   unnest([c FOR c IN string_split(text, '') IF c <> '']) AS ch
        |  FROM documents),
        | cc AS (SELECT doc_id, ch, count(*)::DOUBLE AS c FROM ch GROUP BY 1, 2)
        |SELECT doc_id, count(*)::BIGINT AS n_distinct_chars,
        | log2(sum(c)) - sum(c * log2(c)) / sum(c) AS entropy
        |FROM cc GROUP BY 1""".stripMargin,
    "q_map_funcs" ->
      """WITH e AS (
        |  SELECT l_orderkey, l_linenumber, sum(l_quantity::DOUBLE) AS qty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_orderkey,
        | count(*)::BIGINT AS n_lines,
        | max(CASE WHEN l_linenumber = 1 THEN qty END) AS qty_first,
        | sum(qty) AS sum_qty,
        | count(CASE WHEN qty > 25.0 THEN 1 END)::BIGINT AS n_big
        |FROM e GROUP BY 1""".stripMargin,
    "q_regex_funcs" ->
      """SELECT doc_id,
        | len(regexp_extract_all(text, '([a-z]{6,})', 1))::BIGINT AS n_long,
        | regexp_extract(text, '([a-z]{6,})', 1) AS first_long,
        | length(regexp_replace(text, '[aeiou]', '', 'g'))::BIGINT AS n_novowel
        |FROM documents""".stripMargin
  )
}
