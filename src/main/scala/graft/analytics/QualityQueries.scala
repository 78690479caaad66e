package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession.table

/** Data-quality and anomaly-detection operators — the monitoring face of
  * a production pipeline: column profiling, statistical outlier flagging,
  * and slowly-changing-dimension history. All single-scan or
  * two-aggregation shapes; nothing here grows super-linearly.
  */
object QualityQueries {

  /** Z-score outliers per event type: group stats (one aggregation) join
    * back to the stream (broadcast — the stats table is |event_types|
    * rows), flag |z| > 3. Population stddev so both engines share the
    * formula exactly.
    */
  def qOutlierZscore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = table(spark, dir, "events")
    val stats = ev.groupBy($"event_type")
      .agg(avg($"value").as("mu"), stddev_pop($"value").as("sigma"))
    // sigma > 0 pinned on both sides: Spark 0/0 yields NULL (row dropped)
    // while DuckDB yields inf/NaN (row kept) — filter identically so the
    // behavior is engine-independent, not fixture-dependent
    ev.join(broadcast(stats.filter($"sigma" > 0)), "event_type")
      .withColumn("z", ($"value" - $"mu") / $"sigma")
      .filter(abs($"z") > 3.0)
      .select($"event_id", $"event_type", $"value", $"z")
  }

  /** IQR-rule outliers on event values per type: exact quartiles via
    * `percentile` (one aggregation), fence = 1.5×IQR, then a broadcast
    * join back flags rows outside the fences. The grouped-quantile +
    * join-back shape of any anomaly monitor. (The TPC-H price columns are
    * near-uniform — no mass ever crosses a 1.5×IQR fence — so the fence
    * demo runs on the heavy-tailed `events.value`.)
    */
  def qOutlierIqr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = table(spark, dir, "events")
    val q = ev.groupBy($"event_type")
      .agg(expr("percentile(value, 0.25)").as("q1"),
        expr("percentile(value, 0.75)").as("q3"))
      .withColumn("lo", $"q1" - ($"q3" - $"q1") * 1.5)
      .withColumn("hi", $"q3" + ($"q3" - $"q1") * 1.5)
    ev.join(broadcast(q), "event_type")
      .filter($"value" < $"lo" || $"value" > $"hi")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_outliers"),
        min($"value").as("min_out"),
        max($"value").as("max_out"))
  }

  /** MAD (median absolute deviation) robust outliers per event type —
    * the outlier detector that survives the outliers themselves (mean
    * and stddev are dragged by the very tail they're meant to flag;
    * medians aren't). Two grouped quantile passes (median, then median
    * of |x−med|), both tiny broadcast tables joined back to the stream;
    * modified z = 0.6745·(x−med)/MAD, flag |z| > 3.5 (Iglewicz–Hoaglin
    * convention). mad > 0 pinned on both sides like the sigma/mx guards.
    */
  def qOutlierMad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = table(spark, dir, "events")
    val med = ev.groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = ev.join(broadcast(med), "event_type")
      .groupBy($"event_type")
      .agg(first($"med").as("med"),
        expr("percentile(abs(value - med), 0.5)").as("mad"))
      .filter($"mad" > 0)
    ev.join(broadcast(mad), "event_type")
      .withColumn("rz", lit(0.6745) * ($"value" - $"med") / $"mad")
      .filter(abs($"rz") > 3.5)
      .select($"event_id", $"event_type", $"value", $"rz")
  }

  /** Fixed-bin histogram per event type: bin boundaries are PLAN-TIME
    * CONSTANTS (lo/hi/width literals), so the histogram is one scan-side
    * projection + one aggregation — sizing bins from a min/max `count()`
    * would put a driver job on the plan path and make the schema
    * data-dependent. Edge values clamp into the boundary bins.
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val width = 25.0 // events.value spans (0, 500): 20 bins
    table(spark, dir, "events")
      .select($"event_type",
        least(greatest(floor(($"value" - 0.0) / width), lit(0.0)), lit(19.0))
          .cast("long").as("bin"))
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("n"))
  }

  /** Median + deterministic mode per group. Spark's `median` is the
    * interpolated quantile (exact, mergeable partials); the mode of the
    * discrete bucket column is spelled as count + rank with a TOTAL tie
    * order (count desc, bucket asc) — a bare `mode()` is nondeterministic
    * on ties across engines and partitionings, the same class of bug as
    * unordered string_agg.
    */
  def qModeMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = table(spark, dir, "events")
      .withColumn("bucket", ($"user_id" % 10).cast("long"))
    val wMode = Window.partitionBy($"event_type")
      .orderBy($"c".desc, $"bucket".asc)
    val mode = ev.groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(wMode))
      .filter($"rk" === 1)
      .select($"event_type", $"bucket".as("mode_bucket"))
    ev.groupBy($"event_type")
      .agg(median($"value").as("median_value"), count(lit(1)).as("n"))
      .join(mode, "event_type")
  }

  /** Column profile of lineitem: null rate / distinct count / min / max
    * per profiled column in ONE scan (conditional aggregates, no
    * per-column jobs — a 100 TB profile is one pass).
    */
  def qDqProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = table(spark, dir, "lineitem")
    val profiled = Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice")
    val row = (c: String) => struct(
      lit(c).as("col_name"),
      count(when(col(c).isNull, 1)).as("n_null"),
      countDistinct(col(c)).as("n_distinct"),
      min(col(c)).cast("double").as("min_v"),
      max(col(c)).cast("double").as("max_v"))
    li.agg(count(lit(1)).as("n_rows"),
        array(profiled.map(row): _*).as("cols"))
      .select($"n_rows", explode($"cols").as("c"))
      .select($"c.col_name".as("col_name"), $"n_rows", $"c.n_null".as("n_null"),
        $"c.n_distinct".as("n_distinct"), $"c.min_v".as("min_v"),
        $"c.max_v".as("max_v"))
  }

  /** SCD Type-2 change history: each customer's order-status timeline as
    * validity ranges — a new version row whenever the status CHANGES
    * along the (o_orderdate, o_orderkey) order, valid_to = next change's
    * date (null = current). One shuffle on custkey, two windows (lag for
    * change detection, lead for range close) — the warehouse
    * dimension-history build as a single pass.
    */
  def qScd2History(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byCust = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    val changes = table(spark, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_orderstatus")
      .withColumn("prev_status", lag($"o_orderstatus", 1).over(byCust))
      .filter($"prev_status".isNull || $"prev_status" =!= $"o_orderstatus")
    val byCust2 = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    changes
      .withColumn("valid_to", lead($"o_orderdate", 1).over(byCust2))
      .withColumn("version",
        row_number().over(byCust2).cast("long"))
      .select($"o_custkey".cast("long").as("custkey"), $"version",
        $"o_orderstatus".as("status"),
        $"o_orderdate".as("valid_from"), $"valid_to")
  }

  /** Expectation-suite quarantine (the Deequ/Great-Expectations shape):
    * evaluate a rule set over the fact table in ONE conditional-aggregate
    * scan — per-rule violation counts plus the `any` row (rows a loader
    * would quarantine: violating ≥ 1 rule). Row-level flags are a pure
    * scan-side projection; no rule adds a pass over the data, and the
    * output is |rules|+1 rows at any corpus size. The quarantine SPLIT
    * itself (valid → target, invalid → quarantine path) is the same
    * flags-projection with two filtered writes — this query is its audit
    * report.
    */
  def qDqQuarantine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val flags = table(spark, dir, "lineitem")
      .select(
        ($"l_quantity" < 1.0 || $"l_quantity" > 45.0).as("v_qty"),
        ($"l_discount" > 0.08).as("v_disc"),
        ($"l_extendedprice" < 1000.0).as("v_price"),
        (!$"l_returnflag".isin("A", "N", "R")).as("v_flag"))
    val agg = flags.agg(
      count(lit(1)).as("n"),
      sum(when($"v_qty", 1L).otherwise(0L)).as("n_qty"),
      sum(when($"v_disc", 1L).otherwise(0L)).as("n_disc"),
      sum(when($"v_price", 1L).otherwise(0L)).as("n_price"),
      sum(when($"v_flag", 1L).otherwise(0L)).as("n_flag"),
      sum(when($"v_qty" || $"v_disc" || $"v_price" || $"v_flag", 1L)
        .otherwise(0L)).as("n_any"))
    agg.select(explode(array(
      struct(lit("quantity_in_1_45").as("rule"), $"n_qty".as("n_bad"),
        ($"n_qty".cast("double") / $"n").as("bad_frac")),
      struct(lit("discount_le_008").as("rule"), $"n_disc".as("n_bad"),
        ($"n_disc".cast("double") / $"n").as("bad_frac")),
      struct(lit("price_ge_1000").as("rule"), $"n_price".as("n_bad"),
        ($"n_price".cast("double") / $"n").as("bad_frac")),
      struct(lit("returnflag_domain").as("rule"), $"n_flag".as("n_bad"),
        ($"n_flag".cast("double") / $"n").as("bad_frac")),
      struct(lit("any").as("rule"), $"n_any".as("n_bad"),
        ($"n_any".cast("double") / $"n").as("bad_frac")))).as("r"))
      .select($"r.rule", $"r.n_bad", $"r.bad_frac")
  }

  val queries: Map[String, CoreQueries.QFn] = Map(
    "q_dq_quarantine" -> qDqQuarantine,
    "q_outlier_zscore" -> qOutlierZscore,
    "q_outlier_mad" -> qOutlierMad,
    "q_histogram" -> qHistogram,
    "q_mode_median" -> qModeMedian,
    "q_outlier_iqr" -> qOutlierIqr,
    "q_dq_profile" -> qDqProfile,
    "q_scd2_history" -> qScd2History
  )

  val oracles: Map[String, String] = Map(
    "q_dq_quarantine" ->
      """WITH f AS (
        |  SELECT (l_quantity < 1.0 OR l_quantity > 45.0) AS v_qty,
        |   (l_discount > 0.08) AS v_disc,
        |   (l_extendedprice < 1000.0) AS v_price,
        |   (l_returnflag NOT IN ('A', 'N', 'R')) AS v_flag
        |  FROM lineitem),
        | a AS (
        |  SELECT count(*) AS n,
        |   count(CASE WHEN v_qty THEN 1 END) AS n_qty,
        |   count(CASE WHEN v_disc THEN 1 END) AS n_disc,
        |   count(CASE WHEN v_price THEN 1 END) AS n_price,
        |   count(CASE WHEN v_flag THEN 1 END) AS n_flag,
        |   count(CASE WHEN v_qty OR v_disc OR v_price OR v_flag THEN 1 END) AS n_any
        |  FROM f)
        |SELECT 'quantity_in_1_45' AS rule, n_qty::BIGINT AS n_bad,
        | n_qty::DOUBLE / n AS bad_frac FROM a
        |UNION ALL SELECT 'discount_le_008', n_disc, n_disc::DOUBLE / n FROM a
        |UNION ALL SELECT 'price_ge_1000', n_price, n_price::DOUBLE / n FROM a
        |UNION ALL SELECT 'returnflag_domain', n_flag, n_flag::DOUBLE / n FROM a
        |UNION ALL SELECT 'any', n_any, n_any::DOUBLE / n FROM a""".stripMargin,
    "q_outlier_zscore" ->
      """WITH s AS (
        |  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
        |  FROM events GROUP BY 1
        |  HAVING stddev_pop(value) > 0)
        |SELECT e.event_id, e.event_type, e.value,
        | (e.value - s.mu) / s.sigma AS z
        |FROM events e JOIN s ON e.event_type = s.event_type
        |WHERE abs((e.value - s.mu) / s.sigma) > 3.0""".stripMargin,
    "q_outlier_mad" ->
      """WITH m AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        | d AS (
        |  SELECT e.event_type, any_value(m.med) AS med,
        |   quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN m USING (event_type) GROUP BY 1
        |  HAVING quantile_cont(abs(e.value - m.med), 0.5) > 0)
        |SELECT e.event_id, e.event_type, e.value,
        | 0.6745 * (e.value - d.med) / d.mad AS rz
        |FROM events e JOIN d USING (event_type)
        |WHERE abs(0.6745 * (e.value - d.med) / d.mad) > 3.5""".stripMargin,
    "q_histogram" ->
      """SELECT event_type,
        | least(greatest(floor((value - 0.0) / 25.0), 0.0), 19.0)::BIGINT AS bin,
        | count(*)::BIGINT AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_mode_median" ->
      """WITH b AS (
        |  SELECT event_type, value, user_id % 10 AS bucket FROM events),
        | c AS (
        |  SELECT event_type, bucket, count(*) AS c FROM b GROUP BY 1, 2),
        | md AS (
        |  SELECT event_type, bucket AS mode_bucket, row_number() OVER (
        |    PARTITION BY event_type ORDER BY c DESC, bucket) AS rk
        |  FROM c)
        |SELECT b.event_type, quantile_cont(b.value, 0.5) AS median_value,
        | count(*)::BIGINT AS n, any_value(md.mode_bucket) AS mode_bucket
        |FROM b JOIN md ON b.event_type = md.event_type AND md.rk = 1
        |GROUP BY 1""".stripMargin,
    "q_outlier_iqr" ->
      """WITH q AS (
        |  SELECT event_type,
        |   quantile_cont(value, 0.25) AS q1,
        |   quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY 1),
        | f AS (
        |  SELECT event_type, q1 - (q3 - q1) * 1.5 AS lo,
        |   q3 + (q3 - q1) * 1.5 AS hi FROM q)
        |SELECT e.event_type, count(*) AS n_outliers,
        | min(e.value) AS min_out, max(e.value) AS max_out
        |FROM events e JOIN f ON e.event_type = f.event_type
        |WHERE e.value < f.lo OR e.value > f.hi
        |GROUP BY 1""".stripMargin,
    "q_dq_profile" ->
      """WITH n AS (SELECT count(*)::BIGINT AS n_rows FROM lineitem)
        |SELECT 'l_quantity' AS col_name, n.n_rows,
        | count(CASE WHEN l_quantity IS NULL THEN 1 END)::BIGINT AS n_null,
        | count(DISTINCT l_quantity)::BIGINT AS n_distinct,
        | min(l_quantity)::DOUBLE AS min_v, max(l_quantity)::DOUBLE AS max_v
        |FROM lineitem CROSS JOIN n GROUP BY n.n_rows
        |UNION ALL
        |SELECT 'l_discount', n.n_rows,
        | count(CASE WHEN l_discount IS NULL THEN 1 END)::BIGINT,
        | count(DISTINCT l_discount)::BIGINT,
        | min(l_discount)::DOUBLE, max(l_discount)::DOUBLE
        |FROM lineitem CROSS JOIN n GROUP BY n.n_rows
        |UNION ALL
        |SELECT 'l_tax', n.n_rows,
        | count(CASE WHEN l_tax IS NULL THEN 1 END)::BIGINT,
        | count(DISTINCT l_tax)::BIGINT,
        | min(l_tax)::DOUBLE, max(l_tax)::DOUBLE
        |FROM lineitem CROSS JOIN n GROUP BY n.n_rows
        |UNION ALL
        |SELECT 'l_extendedprice', n.n_rows,
        | count(CASE WHEN l_extendedprice IS NULL THEN 1 END)::BIGINT,
        | count(DISTINCT l_extendedprice)::BIGINT,
        | min(l_extendedprice)::DOUBLE, max(l_extendedprice)::DOUBLE
        |FROM lineitem CROSS JOIN n GROUP BY n.n_rows""".stripMargin,
    "q_scd2_history" ->
      """WITH t AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
        |   lag(o_orderstatus) OVER (PARTITION BY o_custkey
        |     ORDER BY o_orderdate, o_orderkey) AS prev_status
        |  FROM orders),
        | c AS (
        |  SELECT * FROM t
        |  WHERE prev_status IS NULL OR prev_status <> o_orderstatus)
        |SELECT o_custkey::BIGINT AS custkey,
        | row_number() OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey)::BIGINT AS version,
        | o_orderstatus AS status,
        | o_orderdate AS valid_from,
        | lead(o_orderdate) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey) AS valid_to
        |FROM c""".stripMargin
  )
}
