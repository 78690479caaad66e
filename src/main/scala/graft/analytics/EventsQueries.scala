package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession.table

/** Event-time analytics over the driver's `events` stream table — the batch
  * faces of the Structured Streaming operators in `graft.streaming`
  * (tumbling/sliding windows, sessionization). Each is pure DataFrame API
  * with a DuckDB oracle; the streaming specs prove the same logic under
  * watermarks and incremental state.
  */
object EventsQueries {

  /** Tumbling 1-hour event-time window per event type (the batch analog of
    * `groupBy(window($"ts", "1 hour"))` streaming aggregation).
    */
  def qEventsTumbling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "events")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n", $"sum_value")
  }

  /** Per-user session assignment: a new session starts after a >30 min gap.
    * Two stacked windows (lag → running sum of boundary flags); both fully
    * tiebroken so results are deterministic under any partitioning. This is
    * the batch face of `flatMapGroupsWithState` sessionization — it scales
    * as one shuffle on `user_id` then linear in-partition work. `ts` and
    * `value` ride through the projection so downstream session rollups
    * need no join back to the events scan.
    */
  private def sessionized(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    table(spark, dir, "events")
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum($"new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def qEventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sessionized(spark, dir).select($"user_id", $"event_id", $"session_idx")
  }

  /** Session-level rollup: bounds + activity per (user, session) — single
    * pass: the sessionize shuffle already clusters by user_id, and the
    * carried ts/value columns feed the rollup directly (no second events
    * scan, no join back on event_id).
    */
  def qEventsSessionStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sessionized(spark, dir)
      .groupBy($"user_id", $"session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        sum($"value").as("sum_value"))
  }

  /** Native `session_window` (gap 30 min) — the built-in operator face of
    * sessionization (the streaming variant with watermarked state is
    * `EventStreams.sessionWindowAgg`). NOTE the boundary differs from
    * [[qEventsSessionize]]: windows merge on OVERLAP (strict `<`), so a
    * gap of exactly 30:00 starts a NEW session here; the oracle encodes
    * the same `>=` boundary.
    */
  def qEventsSessionWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "events")
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("sum_value"))
      .select($"user_id", $"w.start".as("session_start"),
        $"n_events", $"sum_value")
  }

  /** RANGE JOIN (interval containment, NO equi key): events against
    * overlapping 2-hour campaign windows (each distinct event-hour ±30
    * min). A naive `ts BETWEEN start AND end` join has no equi key — the
    * planner's only options are broadcast-nested-loop or cartesian, both
    * quadratic. The scale shape is BUCKETIZATION: explode each range into
    * its covered 30-minute buckets, equi-join events on their (single)
    * bucket, then verify the exact bounds — the same band-then-verify
    * pattern as the LSH dedup suite, and exact by construction (an event's
    * bucket is unique, so each qualifying (event, range) pair joins
    * exactly once — no dedup needed). Shuffles on the bucket key; range
    * skew (a bucket covered by many ranges) is ordinary join skew, handled
    * by AQE.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = (c: org.apache.spark.sql.Column) =>
      floor(unix_timestamp(c) / 1800).cast("long")
    val ev = table(spark, dir, "events")
      .select($"ts", $"value", bucket($"ts").as("bucket"))
    val ranges = table(spark, dir, "events")
      .groupBy(window($"ts", "1 hour").as("w")).agg(count(lit(1)).as("n_src"))
      .select(
        ($"w.start" - expr("INTERVAL 30 MINUTES")).as("r_start"),
        ($"w.start" + expr("INTERVAL 90 MINUTES")).as("r_end"))
    val banded = ranges.select($"r_start", $"r_end",
      explode(sequence(bucket($"r_start"), bucket($"r_end"))).as("bucket"))
    ev.join(banded, Seq("bucket"))
      .filter($"ts" >= $"r_start" && $"ts" <= $"r_end")
      .groupBy($"r_start")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("sum_value"))
  }

  /** JSON prop extraction (the envelope's semi-structured value surface):
    * pull `k` out of the props JSON and bucket counts by k % 10.
    */
  def qEventsJsonProps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "events")
      .select(get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy(($"k" % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"))
  }

  val queries: Map[String, CoreQueries.QFn] = Map(
    "q_events_tumbling" -> qEventsTumbling,
    "q_events_sessionize" -> qEventsSessionize,
    "q_events_session_stats" -> qEventsSessionStats,
    "q_events_session_window" -> qEventsSessionWindow,
    "q_events_json_props" -> qEventsJsonProps,
    "q_range_join" -> qRangeJoin
  )

  val oracles: Map[String, String] = Map(
    "q_events_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        | count(*) AS n, sum(value) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_events_sessionize" ->
      """SELECT user_id, event_id,
        | SUM(CASE WHEN prev_ts IS NULL
        |          OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800 THEN 1 ELSE 0 END)
        |   OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_idx
        |FROM (SELECT user_id, event_id, ts,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |      FROM events) t""".stripMargin,
    "q_events_session_stats" ->
      """WITH s AS (
        |  SELECT user_id, ts, value,
        |   SUM(CASE WHEN prev_ts IS NULL
        |            OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800 THEN 1 ELSE 0 END)
        |     OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_idx
        |  FROM (SELECT user_id, event_id, ts, value,
        |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |        FROM events) t)
        |SELECT user_id, session_idx, count(*) AS n_events,
        | min(ts) AS session_start, max(ts) AS session_end,
        | sum(value) AS sum_value
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q_events_session_window" ->
      """WITH s AS (
        |  SELECT user_id, ts, value,
        |   SUM(CASE WHEN prev_ts IS NULL
        |            OR floor(epoch(ts)) - floor(epoch(prev_ts)) >= 1800 THEN 1 ELSE 0 END)
        |     OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_idx
        |  FROM (SELECT user_id, event_id, ts, value,
        |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |        FROM events) t)
        |SELECT user_id, min(ts) AS session_start,
        | count(*) AS n_events, sum(value) AS sum_value
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "q_events_json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        | count(*) AS n, sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k
        |FROM events GROUP BY 1""".stripMargin,
    "q_range_join" ->
      """WITH r AS (
        |  SELECT DISTINCT date_trunc('hour', ts) - INTERVAL 30 MINUTE AS r_start,
        |   date_trunc('hour', ts) + INTERVAL 90 MINUTE AS r_end
        |  FROM events)
        |SELECT r.r_start, count(*) AS n_events, sum(e.value) AS sum_value
        |FROM r JOIN events e ON e.ts BETWEEN r.r_start AND r.r_end
        |GROUP BY 1""".stripMargin
  )
}
