package graft.model

/** Core data model of the CDC engine — the Spark-native re-expression of the
  * reference's envelope and event types.
  *
  * Reference: `pkg/mq_config.go:23-36` (MQEvent), `pkg/models.go:43-47`
  * (Columns), `internal/sync_server/sync.go:120-188` (event classes).
  *
  * Design decision (SURVEY.md §1.6): the envelope keeps `before`/`after` as
  * `Map[String, String]` so the *stream* schema is fixed even though each
  * `(database, table)` has its own evolving column list. Values are carried
  * as strings (null-able); the typed view is recovered on demand via
  * [[MySqlTypes]]. This mirrors the reference's `map[string]interface{}`
  * design and is what makes runtime DDL evolution safe under Structured
  * Streaming's fixed-schema requirement.
  */

/** Binlog header carried on every emitted event.
  * Reference: `pkg/mq_config.go:33-36`.
  *
  * `segment` (the source binlog file name) is graft-internal version
  * context, NOT part of the reference's wire header: `logPos` resets to ~4
  * on file rotation and `timestamp` is second-granularity, so
  * (timestamp, logPos) alone cannot order two events straddling a rotation
  * within one second. Downstream last-writer-wins merges order on
  * (timestamp, segment, logPos) — segment names carry a zero-padded numeric
  * suffix (`master.000001` < `master.000002`), so lexicographic order IS
  * rotation order, the same invariant [[graft.sources.cdc.CdcOffset]]'s
  * segment walk relies on. [[graft.cdc.Envelope.valueColumn]] serializes
  * only (timestamp, log_pos), keeping the wire face reference-shaped.
  */
final case class EventHeader(timestamp: Long, logPos: Long,
    segment: String = "")

/** The output envelope — one change event with named before/after images.
  * Reference: `pkg/mq_config.go:23-36`. `orgRow` keeps the raw positional
  * row image(s) exactly like the reference's `OrgRow [][]interface{}`.
  */
final case class MQEvent(
    database: String,
    table: String,
    action: String, // insert | update | delete
    before: Map[String, String],
    after: Map[String, String],
    orgRow: Seq[Seq[String]],
    eventHeader: EventHeader
)

object Actions {
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
  /** Binlog event-type → action tag (P4).
    * Reference: `internal/sync_server/sync.go:137-144`.
    */
  def ofEventType(eventType: String): Option[String] = eventType match {
    case "write_rows"  => Some(Insert)
    case "update_rows" => Some(Update)
    case "delete_rows" => Some(Delete)
    case _             => None
  }
}

/** One raw replication-stream record — the replayable stand-in for a live
  * binlog event (FIXTURES.md §A.3). Row values are strings (null-able);
  * `rows` carries one row image per insert/delete row, and (before, after)
  * consecutive pairs for updates (`internal/sync_server/process.go:115-119`).
  *
  * `eventType`: write_rows | update_rows | delete_rows | query | rotate.
  */
final case class RawBinlogEvent(
    file: String,
    logPos: Long,
    timestamp: Long,
    eventType: String,
    database: String,
    table: String,
    rows: Seq[Seq[String]],
    query: String,     // DDL text for eventType == "query"
    errorCode: Int,    // QueryEvent error code; only 0 is processed (F4)
    nextLogName: String, // for rotate
    position: Long       // for rotate
)

object RawBinlogEvent {
  def rowsEvent(
      eventType: String,
      database: String,
      table: String,
      rows: Seq[Seq[String]],
      file: String = "master.000001",
      logPos: Long = 0L,
      timestamp: Long = 0L
  ): RawBinlogEvent =
    RawBinlogEvent(file, logPos, timestamp, eventType, database, table, rows,
      query = null, errorCode = 0, nextLogName = null, position = 0L)

  def ddl(database: String, sql: String, logPos: Long = 0L,
      timestamp: Long = 0L): RawBinlogEvent =
    RawBinlogEvent("master.000001", logPos, timestamp, "query", database,
      table = null, rows = Seq.empty, query = sql, errorCode = 0,
      nextLogName = null, position = 0L)

  def rotate(nextLogName: String, position: Long): RawBinlogEvent =
    RawBinlogEvent(null, 0L, 0L, "rotate", null, null, Seq.empty, null, 0,
      nextLogName, position)
}

/** One column of a table schema.
  * Reference: `pkg/models.go:43-47` (`Columns{Type, Name, NotNull}`).
  * The reference's `NotNull` is effectively always false due to a
  * case-compare bug (`baseinfo.go:84-89`); we keep the field but treat it
  * as decorative, matching observed behavior.
  */
final case class ColumnDef(name: String, mysqlType: String,
    notNull: Boolean = false)

/** Versioned per-table schema; `version` increments on each applied DDL,
  * mirroring the reference's two-version `Deltas{Old, Def}`
  * (`pkg/models.go:25-41`) generalized to a monotonic version counter.
  */
final case class TableSchema(
    database: String,
    table: String,
    columns: Seq[ColumnDef],
    version: Int = 0
) {
  def columnNames: Seq[String] = columns.map(_.name)
  def key: String = s"$database.$table"
}
