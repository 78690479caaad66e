package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.RawBinlogEvent

/** Replayable CDC event sources — the S1/S2/S3 seam of SURVEY.md §2.1.
  *
  * The reference's source is a live MySQL replication session
  * (`internal/sync_server/sync.go:44-118`); this build environment has no
  * MySQL client (SURVEY.md §7.4), so the source is the pluggable
  * `BinlogReader` seam: a replayable event log with the exact
  * `RawBinlogEvent` schema, usable three ways:
  *
  *   1. batch: `readLog` on a JSONL/parquet fixture;
  *   2. streaming: `streamLog` — `spark.readStream` over a directory of the
  *     same files. Offsets/checkpointing (S2/S3: latest seeding, resume)
  *     come from Structured Streaming's file-source offset log + the query
  *     checkpoint, exactly the semantics the reference hand-rolls with
  *     badger positions;
  *   3. synthetic: `fromEventsTable` — deterministically re-expresses the
  *     driver's `events` parquet as a binlog of row changes, so the full
  *     filter→project→envelope pipeline is exercised (and DuckDB-oracled)
  *     on driver data without a live database.
  */
object BinlogReplay {

  val schema = Encoders.product[RawBinlogEvent].schema

  /** Batch-read a JSONL binlog fixture (FIXTURES.md §A.3 shape). */
  def readLog(spark: SparkSession, path: String): Dataset[RawBinlogEvent] = {
    import spark.implicits._
    spark.read.schema(schema).json(path).as[RawBinlogEvent]
  }

  /** Stream a directory of JSONL binlog fixture files. `maxFilesPerTrigger`
    * bounds micro-batch size the way the reference's one-event loop bounds
    * its unit of work.
    */
  def streamLog(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): Dataset[RawBinlogEvent] = {
    import spark.implicits._
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)
      .as[RawBinlogEvent]
  }

  /** Deterministic events→binlog adapter. Each `events` row becomes one
    * rows-event on table `app.<event_type>`:
    *   - `event_id % 10 == 0` → update_rows with a (before, after) pair
    *     where the after image increments `user_id` (integer-exact, so the
    *     DuckDB oracle reproduces it bit-for-bit);
    *   - `event_id % 10 == 1` → delete_rows;
    *   - otherwise              → write_rows (insert).
    * Row image layout (must match [[appSchemas]]): [event_id, user_id,
    * value]. Values are strings, like the wire format; `value` is 2dp text
    * (driver data is exactly 2dp, verified, so the text form is lossless).
    *
    * Whole mapping is a single narrow projection — no shuffle; scales
    * linearly with input partitions.
    */
  def fromEventsTable(events: DataFrame): Dataset[RawBinlogEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val fmtValue = regexp_replace(format_number(col("value"), 2), ",", "")
    val img = array(
      col("event_id").cast("string"),
      col("user_id").cast("string"),
      fmtValue)
    val imgAfter = array(
      col("event_id").cast("string"),
      (col("user_id") + 1).cast("string"),
      fmtValue)
    val mod = col("event_id") % 10
    events
      .select(
        lit("master.000001").as("file"),
        col("event_id").as("logPos"),
        unix_timestamp(col("ts")).as("timestamp"),
        when(mod === 0, "update_rows")
          .when(mod === 1, "delete_rows")
          .otherwise("write_rows").as("eventType"),
        lit("app").as("database"),
        col("event_type").as("table"),
        when(mod === 0, array(img, imgAfter)).otherwise(array(img)).as("rows"),
        lit(null: String).as("query"),
        lit(0).as("errorCode"),
        lit(null: String).as("nextLogName"),
        lit(0L).as("position")
      )
      .as[RawBinlogEvent]
  }

  /** Registry entries for the adapter's synthetic `app.*` tables. */
  def appSchemas(eventTypes: Seq[String]): Map[String, Seq[String]] =
    eventTypes.map(t => s"app.$t" -> Seq("event_id", "user_id", "value")).toMap
}
