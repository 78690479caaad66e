package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession.table

/** Advanced relational operators beyond the core suite: as-of join (an
  * operator Spark lacks natively, composed scalably from union + window per
  * SURVEY.md §7.3 preference (a)), exact percentiles, conditional
  * aggregation, datetime arithmetic, the `spark.sql` SQL surface, and HLL
  * sketches for the 100 TB cardinality path.
  */
object AdvancedQueries {

  /** As-of join: each purchase event picks the user's most recent STRICTLY
    * PRIOR click (order = (ts, event_id), a total order ⇒ deterministic).
    *
    * Implementation is the scale-correct one: tag both sides, union, one
    * shuffle on `user_id`, then `last(click_id) ignoreNulls` over rows
    * (-∞, -1) — no per-row probe, no range explosion; state is a single
    * running value per partition. At 100 TB this is one sort-merge pass.
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val u = table(spark, dir, "events")
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", $"ts", $"event_id", $"event_type",
        when($"event_type" === "click", $"event_id").as("click_id"),
        when($"event_type" === "click", $"ts").as("click_ts"))
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    u.withColumn("last_click_id", last($"click_id", ignoreNulls = true).over(w))
      .withColumn("last_click_ts", last($"click_ts", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"last_click_id",
        // seconds between the click and the purchase (null if no prior click)
        (unix_timestamp($"ts") - unix_timestamp($"last_click_ts"))
          .as("gap_seconds"))
  }

  /** As-of join WITH TOLERANCE: like [[qAsofJoin]] but a match expires
    * after 15 minutes — the staleness bound of market-data / sensor
    * as-of semantics (pandas `merge_asof(tolerance=...)`). Same
    * single-shuffle running-window plan; the tolerance is a post-window
    * null-out, not a second probe.
    */
  def qAsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val u = table(spark, dir, "events")
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", $"ts", $"event_id", $"event_type",
        when($"event_type" === "click", $"event_id").as("click_id"),
        when($"event_type" === "click", $"ts").as("click_ts"))
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    u.withColumn("last_click_id", last($"click_id", ignoreNulls = true).over(w))
      .withColumn("last_click_ts", last($"click_ts", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .withColumn("gap",
        unix_timestamp($"ts") - unix_timestamp($"last_click_ts"))
      .select($"event_id", $"user_id",
        when($"gap" <= 900L, $"last_click_id").as("matched_click_id"),
        when($"gap" <= 900L, $"gap").as("gap_seconds"))
  }

  /** Exact percentiles (median / p90) — Spark `percentile` and DuckDB
    * `quantile_cont` share linear interpolation.
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("median_price"),
        expr("percentile(o_totalprice, 0.9)").as("p90_price"),
        count(lit(1)).as("n"))
  }

  /** Conditional aggregation: FILTER-style counts/sums in one pass. */
  def qConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        count(when($"l_quantity" > 25.0, 1)).as("n_bulk"),
        count(when($"l_discount" >= 0.05, 1)).as("n_discounted"),
        sum(when($"l_tax" > 0.04, $"l_extendedprice").otherwise(0.0))
          .as("taxed_revenue"),
        (count(when($"l_linestatus" === "F", 1)).cast("double") /
          count(lit(1))).as("f_ratio"))
  }

  /** Datetime arithmetic: intervals, truncation, extraction, diffs. */
  def qDatetimeArith(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "orders")
      .select(
        $"o_orderkey",
        ($"o_orderdate" + expr("INTERVAL 30 DAYS")).as("due_date"),
        date_trunc("month", $"o_orderdate").as("order_month"),
        datediff(lit("1998-12-31").cast("date"), $"o_orderdate")
          .cast("long").as("days_to_eoy"),
        dayofweek($"o_orderdate").cast("long").as("dow"),
        weekofyear($"o_orderdate").cast("long").as("woy"))
  }

  /** String surface 2: regexp_replace / translate / lpad / split indexing. */
  def qStringFuncs2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "part")
      .select(
        $"p_partkey",
        regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"),
        expr("replace(p_brand, '#', 'No')").as("brand_long"),
        lpad($"p_partkey".cast("string"), 10, "0").as("padded_key"),
        element_at(split($"p_type", " "), 1).as("type_head"),
        element_at(split($"p_type", " "), -1).as("type_tail"),
        reverse($"p_brand").as("brand_rev"))
  }

  /** The SQL surface: the same engine driven through `spark.sql` over temp
    * views (proves SQL-parity of the DataFrame plans — Catalyst produces
    * the identical optimized plan for both).
    */
  def qSqlSurface(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("orders_v")
    table(spark, dir, "customer").createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT c_mktsegment,
        |       count(*) AS n_orders,
        |       sum(o_totalprice) AS revenue,
        |       avg(o_totalprice) AS avg_price
        |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
        |WHERE o_orderstatus <> 'F'
        |GROUP BY c_mktsegment""".stripMargin)
  }

  /** Recursive CTE (Spark 4.x `WITH RECURSIVE`) — the calendar-spine
    * shape: generate every month of the order history (TPC-H orders span
    * 1992-01 .. 1998-08 — exactly the 80-month spine anchored at
    * 1992-01-01), then LEFT JOIN the fact aggregate so empty months
    * survive with zero rows (the gap a plain GROUP BY silently drops).
    * The recursion is bounded METADATA (80 spine rows, depth = months,
    * one row per step) — the fact table never enters the loop; the spine
    * side broadcasts into the join at any corpus size.
    */
  def qSqlRecursive(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("orders_rec")
    spark.sql(
      """WITH RECURSIVE spine(n) AS (
        |  SELECT 0
        |  UNION ALL
        |  SELECT n + 1 FROM spine WHERE n < 79
        |)
        |SELECT add_months(DATE '1992-01-01', n) AS month,
        |       count(o_orderkey) AS n_orders,
        |       coalesce(sum(o_totalprice), 0.0D) AS revenue
        |FROM spine LEFT JOIN orders_rec
        |  ON to_date(date_trunc('MONTH', o_orderdate)) =
        |     add_months(DATE '1992-01-01', n)
        |GROUP BY 1""".stripMargin)
  }

  /** LATERAL VIEW explode in SQL — the table-generating-function surface
    * (the SQL spelling of the DataFrame `explode`): split each order
    * priority into tokens, count per (priority, token). The generator
    * runs scan-side (fan-out before the aggregation shuffle), identical
    * to the Column-API explode plan.
    */
  def qLateralExplode(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("orders_lv")
    spark.sql(
      """SELECT o_orderpriority, w AS word, count(*) AS n
        |FROM orders_lv
        |LATERAL VIEW explode(split(o_orderpriority, '-')) t AS w
        |GROUP BY 1, 2""".stripMargin)
  }

  /** Sketch-based distinct cardinalities per group — the 100 TB path
    * where exact distinct is a full shuffle of the key universe but a
    * sketch is O(k) memory per group, one pass, mergeable partials.
    *
    * Estimator: the KMV/theta bottom-k sketch
    * ([[graft.functions.KmvSketch]], same engine as `q_cohort_overlap`).
    * k = 2²⁰ is sized an order of magnitude above the per-group distinct
    * counts at every test SF (sf0.1: ≤ ~110 k distinct orderkeys per
    * flag), so the sketch stays in SPARSE mode where it IS the distinct
    * hash set and the estimate is exact — which is what lets the DuckDB
    * oracle check the whole sketch pipeline (hash, bottom-k merge,
    * sparse-mode estimate) as `count(DISTINCT …)`, the same degeneracy
    * trick `q_cohort_overlap` uses. Past k the SAME query degrades to the
    * (k−1)/u_k estimator at fixed memory; that regime's error envelope —
    * and Spark's HLL (`approx_count_distinct`), the
    * fixed-16-KiB-per-group alternative when even k·8 B is too much — are
    * pinned by `ApproxSpec`/`KmvSpec` against exact counts. `KmvSpec`
    * also pins the SPARSITY MARGIN itself, so a future SF bump fails with
    * a clear diagnostic instead of a mysterious hash mismatch.
    */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val k = ApproxDistinctK
    def est(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(size(arr) < k, size(arr).cast("double"))
        .otherwise(lit((k - 1).toDouble) /
          ((element_at(arr, k).cast("double") -
            lit(Long.MinValue.toDouble)) / lit(math.pow(2, 64))))
    table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        expr(s"graft_kmv(xxhash64(l_partkey), $k)").as("skp"),
        expr(s"graft_kmv(xxhash64(l_orderkey), $k)").as("sko"),
        count(lit(1)).as("n_rows"))
      .select($"l_returnflag",
        est($"skp").as("approx_parts"),
        est($"sko").as("approx_orders"),
        $"n_rows")
  }

  /** Sketch size for [[qApproxDistinct]] — shared with the sparsity pin
    * in `KmvSpec`.
    */
  val ApproxDistinctK: Int = 1 << 20

  /** Cohort-overlap cardinalities via the KMV theta sketch
    * ([[graft.functions.KmvSketch]]): one pass builds a bottom-256 sketch
    * of distinct users per event type; every pairwise audience overlap /
    * union after that is SKETCH-ONLY arithmetic (sorted-merge intersect
    * via `graft_sorted_and_count`, θ = min of the k-th minima) — no
    * re-scan, no distinct-join. The capability HLL lacks: HLL unions but
    * cannot intersect without inclusion–exclusion error blowup. The pair
    * join runs on |types| 1-row sketches — broadcast trivially.
    *
    * k is sized (64 Ki) so the test-scale cohorts stay in SPARSE mode,
    * where the sketch IS the distinct value set and every estimate is
    * exact — which is what makes the DuckDB oracle below a real
    * hash-check of the whole sketch pipeline (build, merge, θ, the
    * sorted-merge intersect). Past k distinct users the SAME query
    * degrades gracefully to the (k−1)/u_k estimator (±1/√(k−2) ≈ 0.4%)
    * at a fixed 512 KiB per group — that regime's error envelope is
    * pinned by `KmvSpec`, which drives the sketch past saturation.
    */
  def qCohortOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val k = 65536
    // u = hash mapped to (0,1); sparse sketches (<k values) are exact
    def theta(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(size(arr) < k, lit(1.0))
        .otherwise((element_at(arr, k).cast("double") -
          lit(Long.MinValue.toDouble)) / lit(math.pow(2, 64)))
    def est(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(size(arr) < k, size(arr).cast("double"))
        .otherwise(lit((k - 1).toDouble) / theta(arr))
    val sk = table(spark, dir, "events")
      .groupBy($"event_type")
      .agg(expr(s"graft_kmv(xxhash64(user_id), $k)").as("sk"))
    val a = sk.select($"event_type".as("type_a"), $"sk".as("ska"))
    val b = sk.select($"event_type".as("type_b"), $"sk".as("skb"))
    a.join(broadcast(b), $"type_a" < $"type_b")
      .withColumn("common", expr("graft_sorted_and_count(ska, skb)"))
      .withColumn("theta", least(theta($"ska"), theta($"skb")))
      .select($"type_a", $"type_b",
        round(est($"ska"), 1).as("est_a"),
        round(est($"skb"), 1).as("est_b"),
        round($"common" / $"theta", 1).as("est_overlap"))
  }

  /** Statistical aggregates: Pearson correlation, population covariance
    * and variance per group — one partial-agg pass (all algebraic /
    * mergeable co-moment aggregates, numerically stable single-pass
    * updates in both engines).
    */
  def qCorrStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        corr($"l_quantity", $"l_extendedprice").as("qty_price_corr"),
        covar_pop($"l_quantity", $"l_discount").as("qty_disc_covar"),
        var_pop($"l_tax").as("tax_var"),
        min($"l_quantity").as("min_qty"),
        count(lit(1)).as("n"))
  }

  /** Approximate percentiles (Greenwald–Khanna style sketch,
    * `approx_percentile`) — the quantile face of the sketch family:
    * memory bounded by the accuracy parameter at any row count, mergeable
    * partials, one pass.
    *
    * `accuracy` is the operator's production knob (default 1000 ⇒ rank
    * error ≤ N/1000 at O(accuracy) memory per group — the 100 TB
    * configuration; `ApproxSpec` pins that envelope against the exact
    * percentiles). The ORACLED face runs at `exactAccuracy`: GK's
    * guarantee is |rank(returned) − target| ≤ N/accuracy, so once
    * accuracy > N the bound is < 1 and the integer rank error is 0 —
    * the sketch returns exactly the element at rank ⌈p·N⌉, which the
    * DuckDB oracle selects directly. 3e6 covers lineitem group sizes
    * through sf0.1 (~250 K rows/group) with margin; this face is a
    * correctness pin, not the scale configuration.
    */
  def qApproxPercentile(spark: SparkSession, dir: String): DataFrame =
    approxPercentile(spark, dir, accuracy = 3000000)

  def approxPercentile(spark: SparkSession, dir: String,
      accuracy: Int = 1000): DataFrame = {
    import spark.implicits._
    table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        expr(s"approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), $accuracy)")
          .as("pcts"),
        count(lit(1)).as("n"))
      // scalar columns, not the raw array: the driver's rows-only check
      // sorts/hashes column values and chokes on array cells
      .select($"l_returnflag",
        element_at($"pcts", 1).as("p50"),
        element_at($"pcts", 2).as("p90"),
        element_at($"pcts", 3).as("p99"),
        $"n")
  }

  /** Pivot (long→wide): order revenue by status × priority. Spark's
    * `pivot` with EXPLICIT values — without them the engine must first scan
    * for distinct pivot values (an extra job) and the output schema becomes
    * data-dependent, which breaks at scale and in streaming. Compiles to
    * one pass of conditional aggregates, same as the SQL spelling.
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "orders")
      .groupBy($"o_orderstatus")
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(sum($"o_totalprice"))
      .select($"o_orderstatus",
        col("1-URGENT").as("p_urgent"), col("2-HIGH").as("p_high"),
        col("3-MEDIUM").as("p_medium"),
        col("4-NOT SPECIFIED").as("p_notspec"), col("5-LOW").as("p_low"))
  }

  /** Correlated scalar subquery — parts priced above their container's
    * average. Written in SQL on purpose: Catalyst DECORRELATES it into the
    * aggregate + join the DataFrame spelling would hand-write, so the
    * optimizer (not the author) removes the per-row re-execution. The
    * 100 TB shape is one shuffle on the correlation key.
    */
  def qCorrelatedScalar(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "part").createOrReplaceTempView("part_v")
    spark.sql(
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part_v p
        |WHERE p_retailprice > 1.2 * (
        |  SELECT avg(p2.p_retailprice) FROM part_v p2
        |  WHERE p2.p_brand = p.p_brand)""".stripMargin)
  }

  /** RANGE window frame (value-based, not row-based): per-customer order
    * revenue within the trailing 30 days of each order. Unlike a ROWS
    * frame the state is bounded by the RANGE width, not the partition
    * size — the frame Spark evaluates with a sliding aggregate buffer.
    */
  def qWindowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy(unix_timestamp($"o_orderdate".cast("timestamp")))
      .rangeBetween(-30L * 86400, 0)
    table(spark, dir, "orders")
      .withColumn("rev_30d", sum($"o_totalprice").over(w))
      .withColumn("n_30d", count(lit(1)).over(w))
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"rev_30d", $"n_30d")
  }

  /** Array / higher-order-function surface over a real array column:
    * size, indexing, min/max, slice-of-sorted, HOF filter + aggregate —
    * all codegen'd or array-local (no explode, no shuffle). Floats are
    * cast to double once so both engines accumulate in double.
    */
  def qArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "embeddings")
      .select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("v"))
      .select(
        $"vec_id",
        size($"v").cast("long").as("n"),
        element_at($"v", 1).as("first_e"),
        array_max($"v").as("max_e"),
        array_min($"v").as("min_e"),
        element_at(slice(sort_array($"v"), 1, 3), 3).as("third_smallest"),
        size(filter($"v", x => x > 0.0)).cast("long").as("n_pos"),
        expr("aggregate(v, 0D, (a, x) -> a + x)").as("sum_e"))
  }

  /** Unpivot (wide→long melt): lineitem metric columns to (metric, value)
    * rows — the inverse of [[qPivot]]; a Generate (no shuffle, no UDF).
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount", $"l_tax")
      .unpivot(
        Array($"l_orderkey", $"l_linenumber"),
        Array($"l_quantity", $"l_discount", $"l_tax"),
        "metric", "value")
      .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
        $"metric", $"value")
  }

  /** String aggregation with DETERMINISTIC order: first-3 sorted distinct
    * market segments per nation as one CSV string. `collect_set` order is
    * partition-dependent, so sort before joining — unordered string_agg
    * is a nondeterminism bug at any scale.
    */
  def qStringAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "customer")
      .groupBy($"c_nationkey".cast("long").as("c_nationkey"))
      .agg(
        concat_ws(",", slice(sort_array(collect_set($"c_mktsegment")), 1, 3))
          .as("segs"),
        count(lit(1)).as("n"))
  }

  /** Explicit GROUPING SETS (the general form behind rollup/cube): chosen
    * group-bys in ONE pass with `grouping()` flags disambiguating the
    * null-as-total rows. Spark expands to a single Expand + aggregate — no
    * repeated scans.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        | grouping(o_orderstatus)::BIGINT AS g_status,
        | grouping(o_orderpriority)::BIGINT AS g_prio,
        | count(*) AS n, sum(o_totalprice) AS revenue
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  /** Bloom-filter semi-join reduction: the selective dimension predicate
    * (urgent orders) aggregates into a fixed 64 KiB bloom bitset
    * ([[graft.functions.BloomAgg]], map-side OR-merge), which broadcasts
    * to the fact side as ONE row; the fact scan probes it with the
    * codegen'd [[graft.functions.BloomContains]] BEFORE the join
    * exchange, so at 100 TB only the ~matching fraction of lineitem
    * shuffles. No false negatives ⇒ the downstream real join makes the
    * result exact (the oracle is the plain join); false positives (~0.2%
    * at this sizing) only cost pruned-side rows. The bitset size is a
    * plan-time constant — sizing it from a count() would put a driver
    * job on the plan path.
    */
  def qBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.BloomFunctions.register(spark)
    val dim = table(spark, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_orderdate")
    val bloom = dim.agg(
      expr("graft_bloom_agg(xxhash64(o_orderkey), 65536, 3)").as("bits"))
    val pruned = table(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      .crossJoin(broadcast(bloom))
      .filter(expr("graft_bloom_contains(bits, xxhash64(l_orderkey), 3)"))
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    pruned.join(dim, $"l_orderkey" === $"o_orderkey")
      .groupBy(year($"o_orderdate").cast("long").as("d_year"))
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val queries: Map[String, CoreQueries.QFn] = Map(
    "q_bloom_join" -> qBloomJoin,
    "q_grouping_sets" -> qGroupingSets,
    "q_unpivot" -> qUnpivot,
    "q_string_agg" -> qStringAgg,
    "q_array_funcs" -> qArrayFuncs,
    "q_pivot" -> qPivot,
    "q_correlated_scalar" -> qCorrelatedScalar,
    "q_window_range_frame" -> qWindowRangeFrame,
    "q_asof_join" -> qAsofJoin,
    "q_asof_tolerance" -> qAsofTolerance,
    "q_percentiles" -> qPercentiles,
    "q_conditional_agg" -> qConditionalAgg,
    "q_datetime_arith" -> qDatetimeArith,
    "q_string_funcs2" -> qStringFuncs2,
    "q_sql_surface" -> qSqlSurface,
    "q_sql_recursive" -> qSqlRecursive,
    "q_approx_distinct" -> qApproxDistinct,
    "q_cohort_overlap" -> qCohortOverlap,
    "q_lateral_explode" -> qLateralExplode,
    "q_corr_stats" -> qCorrStats,
    "q_approx_percentile" -> qApproxPercentile
  )

  val oracles: Map[String, String] = Map(
    "q_corr_stats" ->
      """SELECT l_returnflag,
        | corr(l_quantity, l_extendedprice) AS qty_price_corr,
        | covar_pop(l_quantity, l_discount) AS qty_disc_covar,
        | var_pop(l_tax) AS tax_var,
        | min(l_quantity) AS min_qty,
        | count(*) AS n
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_bloom_join" ->
      """SELECT year(o_orderdate)::BIGINT AS d_year,
        | sum(l_extendedprice * (1.0 - l_discount)) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        | grouping(o_orderstatus)::BIGINT AS g_status,
        | grouping(o_orderpriority)::BIGINT AS g_prio,
        | count(*) AS n, sum(o_totalprice) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "q_unpivot" ->
      """UNPIVOT (SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
        |  l_quantity, l_discount, l_tax FROM lineitem)
        |ON l_quantity, l_discount, l_tax INTO NAME metric VALUE value""".stripMargin,
    "q_string_agg" ->
      """SELECT c_nationkey::BIGINT AS c_nationkey,
        | array_to_string(list_sort(list_distinct(list(c_mktsegment)))[1:3], ',') AS segs,
        | count(*) AS n
        |FROM customer GROUP BY 1""".stripMargin,
    "q_array_funcs" ->
      """WITH d AS (SELECT vec_id,
        |  [x::DOUBLE FOR x IN embedding] AS v FROM embeddings)
        |SELECT vec_id,
        | len(v)::BIGINT AS n,
        | v[1] AS first_e,
        | list_max(v) AS max_e,
        | list_min(v) AS min_e,
        | list_sort(v)[3] AS third_smallest,
        | len(list_filter(v, x -> x > 0.0))::BIGINT AS n_pos,
        | list_reduce(list_prepend(0.0, v), (a, x) -> a + x) AS sum_e
        |FROM d""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderstatus,
        | sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END) AS p_urgent,
        | sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END) AS p_high,
        | sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END) AS p_medium,
        | sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END) AS p_notspec,
        | sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END) AS p_low
        |FROM orders GROUP BY 1""".stripMargin,
    "q_correlated_scalar" ->
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part p
        |WHERE p_retailprice > 1.2 * (
        |  SELECT avg(p2.p_retailprice) FROM part p2
        |  WHERE p2.p_brand = p.p_brand)""".stripMargin,
    "q_window_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | sum(o_totalprice) OVER w AS rev_30d,
        | count(*) OVER w AS n_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, event_type,
        |   CASE WHEN event_type = 'click' THEN event_id END AS click_id,
        |   CASE WHEN event_type = 'click' THEN ts END AS click_ts
        |  FROM events WHERE event_type IN ('click', 'purchase'))
        |SELECT event_id, user_id, last_click_id,
        | (floor(epoch(ts)) - floor(epoch(last_click_ts)))::BIGINT AS gap_seconds
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |   last_value(click_id IGNORE NULLS) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_id,
        |   last_value(click_ts IGNORE NULLS) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
        |  FROM u) t
        |WHERE event_type = 'purchase'""".stripMargin,
    "q_asof_tolerance" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, event_type,
        |   CASE WHEN event_type = 'click' THEN event_id END AS click_id,
        |   CASE WHEN event_type = 'click' THEN ts END AS click_ts
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        | t AS (
        |  SELECT event_id, user_id, ts, event_type,
        |   last_value(click_id IGNORE NULLS) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_id,
        |   last_value(click_ts IGNORE NULLS) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
        |  FROM u),
        | g AS (
        |  SELECT event_id, user_id,
        |   last_click_id,
        |   (floor(epoch(ts)) - floor(epoch(last_click_ts)))::BIGINT AS gap
        |  FROM t WHERE event_type = 'purchase')
        |SELECT event_id, user_id,
        | CASE WHEN gap <= 900 THEN last_click_id END AS matched_click_id,
        | CASE WHEN gap <= 900 THEN gap END AS gap_seconds
        |FROM g""".stripMargin,
    "q_percentiles" ->
      """SELECT o_orderpriority,
        | quantile_cont(o_totalprice, 0.5) AS median_price,
        | quantile_cont(o_totalprice, 0.9) AS p90_price,
        | count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    "q_conditional_agg" ->
      """SELECT l_returnflag,
        | count(*) FILTER (l_quantity > 25.0) AS n_bulk,
        | count(*) FILTER (l_discount >= 0.05) AS n_discounted,
        | sum(CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0.0 END) AS taxed_revenue,
        | count(*) FILTER (l_linestatus = 'F')::DOUBLE / count(*) AS f_ratio
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_datetime_arith" ->
      """SELECT o_orderkey,
        | o_orderdate + INTERVAL 30 DAY AS due_date,
        | date_trunc('month', o_orderdate)::TIMESTAMP AS order_month,
        | datediff('day', o_orderdate, DATE '1998-12-31')::BIGINT AS days_to_eoy,
        | dayofweek(o_orderdate)::BIGINT + 1 AS dow,
        | weekofyear(o_orderdate)::BIGINT AS woy
        |FROM orders""".stripMargin,
    "q_string_funcs2" ->
      """SELECT p_partkey,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        | replace(p_brand, '#', 'No') AS brand_long,
        | lpad(p_partkey::VARCHAR, 10, '0') AS padded_key,
        | string_split(p_type, ' ')[1] AS type_head,
        | string_split(p_type, ' ')[-1] AS type_tail,
        | reverse(p_brand) AS brand_rev
        |FROM part""".stripMargin,
    "q_lateral_explode" ->
      """WITH t AS (
        |  SELECT o_orderpriority,
        |   unnest(string_split(o_orderpriority, '-')) AS word
        |  FROM orders)
        |SELECT o_orderpriority, word, count(*)::BIGINT AS n
        |FROM t GROUP BY 1, 2""".stripMargin,
    "q_sql_surface" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | sum(o_totalprice) AS revenue, avg(o_totalprice) AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus <> 'F'
        |GROUP BY c_mktsegment""".stripMargin,
    "q_sql_recursive" ->
      """WITH RECURSIVE spine(n) AS (
        |  SELECT 0
        |  UNION ALL
        |  SELECT n + 1 FROM spine WHERE n < 79
        |)
        |SELECT (DATE '1992-01-01' + n * INTERVAL 1 MONTH)::DATE AS month,
        |       count(o_orderkey)::BIGINT AS n_orders,
        |       coalesce(sum(o_totalprice), 0.0) AS revenue
        |FROM spine LEFT JOIN orders
        |  ON date_trunc('month', o_orderdate) =
        |     DATE '1992-01-01' + n * INTERVAL 1 MONTH
        |GROUP BY 1""".stripMargin,
    // exact in KMV sparse mode (see qCohortOverlap's k sizing): the
    // oracle computes the true distinct counts and pairwise overlaps —
    // a full hash-check of the sketch build/merge/intersect pipeline.
    // (64-bit xxhash64 collisions would break the equality; at ≤ 64 Ki
    // distinct users the collision probability is < 2^-32.)
    "q_cohort_overlap" ->
      """WITH t AS (SELECT DISTINCT event_type, user_id FROM events),
        | c AS (SELECT event_type, count(*)::DOUBLE AS n FROM t GROUP BY 1),
        | ov AS (
        |  SELECT x.event_type AS type_a, y.event_type AS type_b,
        |   count(*)::DOUBLE AS o
        |  FROM t x JOIN t y
        |   ON x.user_id = y.user_id AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT ca.event_type AS type_a, cb.event_type AS type_b,
        | round(ca.n, 1) AS est_a, round(cb.n, 1) AS est_b,
        | round(coalesce(ov.o, 0.0), 1) AS est_overlap
        |FROM c ca JOIN c cb ON ca.event_type < cb.event_type
        |LEFT JOIN ov ON ov.type_a = ca.event_type
        | AND ov.type_b = cb.event_type""".stripMargin,
    // exact because the KMV sketch is in sparse mode at every test SF —
    // the sparsity margin is spec-pinned (KmvSpec)
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        | CAST(count(DISTINCT l_partkey) AS DOUBLE) AS approx_parts,
        | CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS approx_orders,
        | count(*)::BIGINT AS n_rows
        |FROM lineitem GROUP BY 1""".stripMargin,
    // exact because GK at accuracy > N has integer rank error 0 (see
    // qApproxPercentile): Spark returns the element at 1-based rank
    // ⌈p·N⌉ of the sorted group (verified at sf0.001/0.01/0.1, which
    // also pins the distributed partial-merge path). The accuracy-1000
    // production envelope stays spec-pinned in ApproxSpec.
    "q_approx_percentile" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice,
        |   row_number() OVER (PARTITION BY l_returnflag
        |     ORDER BY l_extendedprice) AS rk,
        |   count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        | max(CASE WHEN rk = CAST(ceil(0.5 * n) AS BIGINT)
        |   THEN l_extendedprice END) AS p50,
        | max(CASE WHEN rk = CAST(ceil(0.9 * n) AS BIGINT)
        |   THEN l_extendedprice END) AS p90,
        | max(CASE WHEN rk = CAST(ceil(0.99 * n) AS BIGINT)
        |   THEN l_extendedprice END) AS p99,
        | max(n)::BIGINT AS n
        |FROM r GROUP BY 1""".stripMargin
  )
}
