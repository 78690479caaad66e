package graft.sources.cdc

import java.nio.file.{Files, Path}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.model.RawBinlogEvent
import graft.sources.BinlogReplay

/** DSv2 `graft-cdc` source: schema parity with the replay model, batch +
  * micro-batch reads, offset resume (S3), latest seeding (S2), and
  * database/table filter pushdown into the reader.
  */
class CdcSourceSpec extends SparkSpec {

  private def seg(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes)

  private def line(pos: Long, db: String, table: String, id: Long): String =
    s"""{"file":"b.1","logPos":$pos,"timestamp":${1000 + pos},"eventType":"write_rows","database":"$db","table":"$table","rows":[["$id","v$id"]],"errorCode":0,"position":0}"""

  test("source schema matches the RawBinlogEvent encoder schema") {
    assert(CdcSource.Schema == BinlogReplay.schema,
      "DSv2 schema must stay in sync with the typed replay model")
  }

  test("batch read parses segments into typed events") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cdcsrc")
    seg(dir, "binlog.000001.jsonl", Seq(line(1, "shop", "orders", 1)))
    seg(dir, "binlog.000002.jsonl", Seq(line(2, "shop", "audit", 2),
      line(3, "crm", "leads", 3)))
    val ds = spark.read.format("graft-cdc").option("path", dir.toString)
      .load().as[RawBinlogEvent]
    val got = ds.collect().sortBy(_.logPos)
    assert(got.length == 3)
    assert(got(0).table == "orders" && got(0).rows == Seq(Seq("1", "v1")))
    assert(got(2).database == "crm")
  }

  test("SegmentLineIndex: trigger loop never re-reads a static tail") {
    val dir = Files.createTempDirectory("cdcidx")
    val p = dir.resolve("binlog.000001.jsonl")
    val idx = new CdcSource.SegmentLineIndex

    Files.write(p, "a\nb\nc\n".getBytes)
    assert(idx.lines(p) == 3L && idx.lines(p) == CdcSource.lineCount(p))
    val afterFirst = idx.bytesScanned.get()
    assert(afterFirst == Files.size(p))

    // a large-segment trigger loop: unchanged tail must cost stat only
    (1 to 100).foreach(_ => assert(idx.lines(p) == 3L))
    assert(idx.bytesScanned.get() == afterFirst, "static tail was re-read")

    // append: only the suffix is scanned
    Files.write(p, "d\ne".getBytes, java.nio.file.StandardOpenOption.APPEND)
    assert(idx.lines(p) == 5L && idx.lines(p) == CdcSource.lineCount(p))
    assert(idx.bytesScanned.get() == Files.size(p),
      "append scan must cover exactly the appended bytes")

    // unterminated trailing line completes later — count stays consistent
    Files.write(p, "-tail\nf\n".getBytes, java.nio.file.StandardOpenOption.APPEND)
    assert(idx.lines(p) == 6L && idx.lines(p) == CdcSource.lineCount(p))
    assert(idx.bytesScanned.get() == Files.size(p))
  }

  test("micro-batch stream resumes from checkpointed offsets (S3)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cdcsrc2")
    val ckpt = Files.createTempDirectory("cdcsrc2-ckpt")
    val out = collection.mutable.Buffer.empty[Long]
    def run(): Unit = {
      val q = spark.readStream.format("graft-cdc").option("path", dir.toString)
        .load().as[RawBinlogEvent]
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[RawBinlogEvent], _: Long) =>
          out ++= b.collect().map(_.logPos)
          ()
        }
        .start()
      q.awaitTermination(60000)
    }
    seg(dir, "binlog.000001.jsonl", Seq(line(1, "shop", "orders", 1),
      line(2, "shop", "orders", 2)))
    run()
    assert(out.sorted == Seq(1L, 2L))
    // append a segment; only its events replay after restart
    seg(dir, "binlog.000002.jsonl", Seq(line(3, "shop", "orders", 3)))
    out.clear()
    run()
    assert(out == Seq(3L), s"resume must deliver only new events, got $out")
  }

  test("startingOffsets=latest skips the existing backlog (S2)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cdcsrc3")
    val ckpt = Files.createTempDirectory("cdcsrc3-ckpt")
    seg(dir, "binlog.000001.jsonl", Seq(line(1, "shop", "orders", 1)))
    val out = collection.mutable.Buffer.empty[Long]
    def run(): Unit = {
      val q = spark.readStream.format("graft-cdc")
        .option("path", dir.toString)
        .option("startingOffsets", "latest")
        .load().as[RawBinlogEvent]
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[RawBinlogEvent], _: Long) =>
          out ++= b.collect().map(_.logPos)
          ()
        }
        .start()
      q.awaitTermination(60000)
    }
    run()
    assert(out.isEmpty, "latest seeding must skip the backlog")
    seg(dir, "binlog.000002.jsonl", Seq(line(5, "shop", "orders", 5)))
    run()
    assert(out == Seq(5L))
  }

  test("database/table filters are pushed into the scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cdcsrc4")
    seg(dir, "binlog.000001.jsonl", Seq(
      line(1, "shop", "orders", 1), line(2, "crm", "leads", 2),
      line(3, "shop", "audit", 3)))
    val df = spark.read.format("graft-cdc").option("path", dir.toString)
      .load().filter($"database" === "shop" && $"table" === "orders")
    // plan shows the pushed filters on the custom scan
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s.scan
    }
    assert(scan.exists(_.description().contains("dbs=Some(Set(shop))")),
      s"expected pushed db filter in ${scan.map(_.description())}")
    assert(df.as[RawBinlogEvent].collect().map(_.logPos).toSeq == Seq(1L))
  }

  test("historical start offset replays from (segment, line), paced, then " +
      "hands off to live tailing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cdcsrc5")
    val ckpt = Files.createTempDirectory("cdcsrc5-ckpt")
    // 4 + 3 line backlog; backfill from (segment 1, line 2): the first
    // two lines of segment 1 are history the task does NOT want
    seg(dir, "binlog.000001.jsonl", (1 to 4).map(i => line(i, "shop", "orders", i)))
    seg(dir, "binlog.000002.jsonl", (5 to 7).map(i => line(i, "shop", "orders", i)))
    val batches = collection.mutable.Buffer.empty[Seq[Long]]
    def run(): Unit = {
      val q = spark.readStream.format("graft-cdc")
        .option("path", dir.toString)
        .option("startingOffsets", """{"segment":"binlog.000001.jsonl","line":2}""")
        .option("maxLinesPerTrigger", "2")
        .load().as[RawBinlogEvent]
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[RawBinlogEvent], _: Long) =>
          batches += b.collect().map(_.logPos).toSeq.sorted
          ()
        }
        .start()
      q.awaitTermination(60000)
    }
    run()
    // only lines >= the historical offset, complete and in order, under
    // the admission cap throughout the catch-up
    assert(batches.flatten.toSeq == (3L to 7L), batches)
    assert(batches.forall(_.length <= 2), batches)
    // live tail hand-off: new data arrives, the SAME checkpointed task
    // picks up only the new lines (startingOffsets is initial-run only)
    seg(dir, "binlog.000003.jsonl", Seq(line(8, "shop", "orders", 8)))
    batches.clear()
    run()
    assert(batches.flatten.toSeq == Seq(8L), batches)
  }

  test("malformed startingOffsets JSON fails fast instead of silently " +
      "replaying the whole log") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cdcsrc6")
    val ckpt = Files.createTempDirectory("cdcsrc6-ckpt")
    seg(dir, "binlog.000001.jsonl", Seq(line(1, "shop", "orders", 1)))
    // a typo'd key ("seg") parses to the default ("", 0) == Beginning —
    // exactly the unpaced full replay the bounded-backfill option exists
    // to prevent; the source must refuse, naming the problem
    val q = spark.readStream.format("graft-cdc")
      .option("path", dir.toString)
      .option("startingOffsets", """{"seg":"binlog.000001.jsonl","line":2}""")
      .load().as[RawBinlogEvent]
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .format("noop")
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(60000)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("segment")), messages(e))
  }

  test("maxLinesPerTrigger paces catch-up into bounded micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cdcsrc4")
    val ckpt = Files.createTempDirectory("cdcsrc4-ckpt")
    // a 7-line backlog across two segments; cap = 2 lines per batch
    seg(dir, "binlog.000001.jsonl", (1 to 4).map(i => line(i, "shop", "orders", i)))
    seg(dir, "binlog.000002.jsonl", (5 to 7).map(i => line(i, "shop", "orders", i)))
    val batches = collection.mutable.Buffer.empty[Seq[Long]]
    val q = spark.readStream.format("graft-cdc")
      .option("path", dir.toString)
      .option("maxLinesPerTrigger", "2")
      .load().as[RawBinlogEvent]
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[RawBinlogEvent], _: Long) =>
        batches += b.collect().map(_.logPos).toSeq.sorted
        ()
      }
      .start()
    q.awaitTermination(60000)
    // complete, in-order delivery...
    assert(batches.flatten.toSeq == (1L to 7L))
    // ...in >= ceil(7/2) = 4 batches, none above the cap (a segment
    // boundary may split a batch below it)
    assert(batches.count(_.nonEmpty) >= 4, batches)
    assert(batches.forall(_.length <= 2), batches)
  }
}
