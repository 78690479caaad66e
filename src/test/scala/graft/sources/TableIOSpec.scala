package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Source-format breadth: the engine's operators are format-agnostic
  * DataFrame plans, so any format Spark reads feeds them. This spec pins
  * the JSON and CSV round-trips (schema declared EXPLICITLY on read —
  * schema inference is a full extra pass over the data at 100 TB and a
  * nondeterminism source, so production reads always declare).
  */
class TableIOSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def events = graft.GraftSession
    .table(spark, "/root/testdata/sf0.001", "events")
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  test("json round-trip preserves the events surface") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    events.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.count() === events.count())
    assert(back.exceptAll(events).count() === 0)
    assert(events.exceptAll(back).count() === 0)
  }

  test("csv round-trip preserves the events surface") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    events.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.count() === events.count())
    assert(back.exceptAll(events).count() === 0)
    assert(events.exceptAll(back).count() === 0)
  }

  test("orc round-trip preserves the events surface (columnar alternative " +
      "to parquet, predicate pushdown intact)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    events.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(schema).orc(dir)
    assert(back.count() === events.count())
    assert(back.exceptAll(events).count() === 0)
    assert(events.exceptAll(back).count() === 0)
    // ORC scans push predicates like parquet — the scan node must carry
    // the filter, not evaluate it post-scan only
    val plan = back.filter(col("event_id") === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), EqualTo(event_id,42)]"),
      plan)
  }

  test("GraftSession.table normalizes every events.ts encoding the driver " +
      "has shipped (NTZ, int64 nanos, plain timestamp)") {
    // the driver regenerated events.parquet with a different physical ts
    // encoding twice already (int64 TIMESTAMP(NANOS) → timestamp[us] NTZ);
    // this pins that all THREE load as the same session-TZ TimestampType
    // with identical instants, so the next regeneration is a no-op here
    val src = graft.GraftSession
      .table(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"))
    def dirFor(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft-enc-$tag").toString
    val ntzDir = dirFor("ntz")
    src.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    val nanosDir = dirFor("nanos")
    src.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    val tzDir = dirFor("tz")
    src.write.mode("overwrite").parquet(s"$tzDir/events.parquet")
    Seq(ntzDir, nanosDir, tzDir).foreach { d =>
      val back = graft.GraftSession.table(spark, d, "events")
      assert(back.schema("ts").dataType === TimestampType, d)
      assert(back.exceptAll(src).count() === 0, d)
      assert(src.exceptAll(back).count() === 0, d)
    }
  }

  test("an analytics operator runs unchanged over the json copy") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json2").toString
    events.write.mode("overwrite").json(dir)
    val agg = spark.read.schema(schema).json(dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    val expected = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    assert(agg.exceptAll(expected).count() === 0)
  }
}
