package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.table
import graft.cdc.TaskFilter
import graft.model.ColumnDef
import graft.registry.SchemaRegistry
import graft.sources.BinlogReplay
import graft.streaming.CdcPipeline

/** DuckDB-oracled exercises of the CDC dataflow (SURVEY.md §2.1–2.4) over
  * driver data: the `events` table replayed as a deterministic binlog
  * (see [[BinlogReplay.fromEventsTable]]) and pushed through the REAL
  * filter→project→envelope pipeline — the same code the streaming path runs
  * per micro-batch. The oracle reproduces the expected envelopes with plain
  * SQL over `events`.
  */
object CdcQueries {

  /** The five event types the driver generator emits — the synthetic
    * `app.*` table registry (stands in for `SHOW FULL COLUMNS` capture).
    */
  val eventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  private def pipeline(filter: TaskFilter): CdcPipeline = {
    val registry = new SchemaRegistry()
    eventTypes.foreach { t =>
      registry.put(graft.model.TableSchema("app", t, Seq(
        ColumnDef("event_id", "bigint"),
        ColumnDef("user_id", "bigint"),
        ColumnDef("value", "decimal(10,2)"))))
    }
    new CdcPipeline("t_cdc", registry, filter)
  }

  /** F1+F2+F3+P1–P4+P6: full envelope pipeline, `app.*` include with one
    * table excluded; flattened to oracle-comparable columns.
    */
  def cdcEnvelope(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = BinlogReplay.fromEventsTable(table(spark, dir, "events"))
    val p = pipeline(TaskFilter(
      databases = Seq("app"),
      tables = Seq("app.*"),
      excludeTables = Seq("app.click")))
    val env = p.projectBatch(raw)
    env.select(
      $"database".as("db"),
      $"table".as("tbl"),
      $"action",
      concat_ws(".", lit(p.taskId), $"database", $"table").as("topic"),
      concat_ws(".", $"database", $"table").as("msg_key"),
      coalesce(element_at($"after", "event_id"),
        element_at($"before", "event_id")).cast("long").as("event_id"),
      coalesce(element_at($"after", "user_id"),
        element_at($"before", "user_id")).cast("long").as("user_id"),
      coalesce(element_at($"after", "value"),
        element_at($"before", "value")).as("value_str")
    )
  }

  /** P3 pairing: update events only — before/after images side by side. */
  def cdcUpdatePairing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = BinlogReplay.fromEventsTable(table(spark, dir, "events"))
    val env = pipeline(TaskFilter(databases = Seq("app"))).projectBatch(raw)
    env.filter($"action" === "update")
      .select(
        $"table".as("tbl"),
        element_at($"before", "event_id").cast("long").as("event_id"),
        element_at($"before", "user_id").cast("long").as("user_before"),
        element_at($"after", "user_id").cast("long").as("user_after"),
        // orgRow carries both positional images, in (before, after) order
        element_at(element_at($"orgRow", 1), 2).cast("long").as("org_before"),
        element_at(element_at($"orgRow", 2), 2).cast("long").as("org_after")
      )
  }

  /** F2 deep-include wildcardless path: only two fully-qualified tables. */
  def cdcDeepInclude(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = BinlogReplay.fromEventsTable(table(spark, dir, "events"))
    val env = pipeline(TaskFilter(
      tables = Seq("app.view", "app.error"))).projectBatch(raw)
    env.groupBy($"table".as("tbl"), $"action")
      .agg(count(lit(1)).as("n"))
  }

  val queries: Map[String, CoreQueries.QFn] = Map(
    "cdc_envelope" -> cdcEnvelope,
    "cdc_update_pairing" -> cdcUpdatePairing,
    "cdc_deep_include" -> cdcDeepInclude
  )

  val oracles: Map[String, String] = Map(
    "cdc_envelope" ->
      """SELECT 'app' AS db, event_type AS tbl,
        | CASE WHEN event_id % 10 = 0 THEN 'update'
        |      WHEN event_id % 10 = 1 THEN 'delete'
        |      ELSE 'insert' END AS action,
        | 't_cdc.app.' || event_type AS topic,
        | 'app.' || event_type AS msg_key,
        | event_id,
        | CASE WHEN event_id % 10 = 0 THEN user_id + 1 ELSE user_id END AS user_id,
        | printf('%.2f', value) AS value_str
        |FROM events
        |WHERE event_type <> 'click'""".stripMargin,
    "cdc_update_pairing" ->
      """SELECT event_type AS tbl, event_id,
        | user_id AS user_before, user_id + 1 AS user_after,
        | user_id AS org_before, user_id + 1 AS org_after
        |FROM events WHERE event_id % 10 = 0""".stripMargin,
    "cdc_deep_include" ->
      """SELECT event_type AS tbl,
        | CASE WHEN event_id % 10 = 0 THEN 'update'
        |      WHEN event_id % 10 = 1 THEN 'delete'
        |      ELSE 'insert' END AS action,
        | count(*) AS n
        |FROM events WHERE event_type IN ('view','error')
        |GROUP BY 1, 2""".stripMargin
  )
}
