package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.model.MQEvent

/** Envelope serialization + sink routing — operators P5/P6 + the K1 message
  * shape of SURVEY.md §2.3–2.4.
  *
  * Reference: JSON-marshal per event (`internal/mq_manager/kafka/kafka.go:109`),
  * Kafka topic `"{taskID}.{db}.{table}"` and key `"{db}.{table}"`
  * (`kafka.go:117-118`).
  *
  * Spark-native shape: one `select` producing (`topic`, `key`, `value`)
  * columns — exactly what the built-in Kafka sink consumes, with per-row
  * topic routing for free. `to_json` is codegen'd, so the reference's
  * `NumCPU*4` marshal pool (K2) is subsumed by partition parallelism.
  */
object Envelope {

  /** `value`: the JSON envelope, field order matching `pkg/mq_config.go:23-36`. */
  def valueColumn: Column =
    to_json(struct(
      col("database"), col("table"), col("action"),
      col("before"), col("after"),
      col("orgRow").as("org_row"),
      struct(
        col("eventHeader.timestamp").as("timestamp"),
        col("eventHeader.logPos").as("log_pos")
      ).as("event_header")
    ))

  /** `topic` = taskId.db.table (P6, `kafka.go:117`). */
  def topicColumn(taskId: String): Column =
    concat_ws(".", lit(taskId), col("database"), col("table"))

  /** `key` = db.table (P6, `kafka.go:118`). */
  def keyColumn: Column = concat_ws(".", col("database"), col("table"))

  /** Project a typed envelope stream to the Kafka-sink wire shape.
    * `df.writeStream.format("kafka")` (acks=all, retries=5 via
    * `kafka.acks`/`kafka.retries` options) consumes this directly; the memory
    * / parquet sinks used in tests consume the same frame.
    */
  def toKafkaFrame(events: Dataset[MQEvent], taskId: String): DataFrame =
    events.select(
      topicColumn(taskId).as("topic"),
      keyColumn.as("key"),
      valueColumn.as("value")
    )

  /** K1: the production Kafka writer, fully configured — producer options
    * mirror the reference's sarama config (`internal/mq_manager/kafka/
    * kafka.go:25-95`: `RequiredAcks=WaitForAll`, retry max 5). Per-row
    * topic routing comes from the frame's `topic` column, so one writer
    * serves every (db, table) of the task — the reference's per-topic
    * producer map collapses into the sink. The returned builder is
    * `.start()`-able wherever a broker exists; this sandbox has none, so
    * `EnvelopeSpec` pins the builder's format and options instead of the
    * wire round-trip.
    */
  def kafkaWriter(
      frame: DataFrame,
      bootstrapServers: String,
      checkpointDir: String,
      acks: String = "all",
      retries: Int = 5
  ): DataStreamWriter[Row] =
    frame.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("kafka.acks", acks)
      .option("kafka.retries", retries.toString)
      .option("checkpointLocation", checkpointDir)
}
