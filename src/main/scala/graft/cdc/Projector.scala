package graft.cdc

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model._

/** Raw binlog rows-event → `MQEvent` envelope projection — operators P1–P4
  * of SURVEY.md §2.3.
  *
  * Reference semantics:
  *   - insert (`rowEventInsert`, `process.go:184-214`): each row image zipped
  *     positionally with the table's ordered column names → `after` map;
  *   - delete (`rowEventDelete`, `process.go:151-182`): same → `before` map;
  *   - update (`rowEventUpdate`, `process.go:114-149`): rows consumed in
  *     (i, i+1) pairs, one event per pair — requires an even row count ≥ 2.
  *     ⚠ The reference labels `After = Rows[i]`, `Before = Rows[i+1]`
  *     (`process.go:138-141`), i.e. swapped vs. the MySQL binlog's
  *     (before, after) pair order. We use the CORRECT orientation
  *     (before = first image, after = second); the discrepancy is pinned by
  *     `ProjectorSpec`.
  *   - column-count validation (`process.go:192-196`): a row image whose
  *     arity differs from the registered schema drops the event (schema
  *     drift mid-stream) rather than emitting a misaligned map.
  *
  * Scale: the per-(db,table) column lists ride to executors as a broadcast
  * snapshot (read-through cache analog of `baseinfo.go:39-58`); the flatMap
  * itself is embarrassingly parallel across source partitions, so throughput
  * scales linearly with executors while per-partition order is preserved
  * (the reference's single-thread ordering guarantee, `sync.go:105`, holds
  * per source partition).
  */
object Projector {

  /** Zip one positional row image with its ordered column names. */
  def zipRow(columns: Seq[String], row: Seq[String]): Map[String, String] =
    columns.iterator.zip(row.iterator).toMap

  /** Project one raw rows-event into zero or more envelopes, given the
    * ordered column list for its table (None ⇒ unknown table ⇒ drop).
    */
  def projectEvent(
      e: RawBinlogEvent,
      columns: Option[Seq[String]]
  ): Seq[MQEvent] = {
    val header = EventHeader(e.timestamp, e.logPos)
    Actions.ofEventType(e.eventType) match {
      case None => Seq.empty
      case Some(action) =>
        columns match {
          case None => Seq.empty
          case Some(cols) =>
            val arityOk = e.rows.forall(_.length == cols.length)
            if (!arityOk) Seq.empty
            else
              action match {
                case Actions.Insert =>
                  e.rows.map { row =>
                    MQEvent(e.database, e.table, action,
                      before = Map.empty, after = zipRow(cols, row),
                      orgRow = Seq(row), eventHeader = header)
                  }
                case Actions.Delete =>
                  e.rows.map { row =>
                    MQEvent(e.database, e.table, action,
                      before = zipRow(cols, row), after = Map.empty,
                      orgRow = Seq(row), eventHeader = header)
                  }
                case Actions.Update =>
                  // even-count pairing guard: process.go:115-117
                  if (e.rows.length < 2 || e.rows.length % 2 != 0) Seq.empty
                  else
                    e.rows.grouped(2).map { pair =>
                      val (beforeRow, afterRow) = (pair(0), pair(1))
                      MQEvent(e.database, e.table, action,
                        before = zipRow(cols, beforeRow),
                        after = zipRow(cols, afterRow),
                        orgRow = Seq(beforeRow, afterRow),
                        eventHeader = header)
                    }.toSeq
                case _ => Seq.empty
              }
        }
    }
  }

  /** Distributed projection: filter (F1–F3) + project (P1–P4) over a typed
    * Dataset, with the schema registry snapshot broadcast to executors.
    * Works identically on batch Datasets and streaming Datasets (the same
    * code path serves offline replay and Structured Streaming micro-batches).
    */
  def project(
      events: Dataset[RawBinlogEvent],
      schemaSnapshot: Map[String, Seq[String]],
      filter: TaskFilter = TaskFilter.allowAll
  ): Dataset[MQEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val bc: Broadcast[Map[String, Seq[String]]] =
      spark.sparkContext.broadcast(schemaSnapshot)
    val f = filter // avoid closing over `this`
    events
      .filter(e =>
        e.database != null && e.table != null && f.accepts(e.database, e.table))
      .flatMap(e => projectEvent(e, bc.value.get(s"${e.database}.${e.table}")))
  }
}
