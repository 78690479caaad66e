package graft.sources.cdc

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.util.MiniJson
import graft.util.MiniJson.JValue

/** DataSource V2 streaming CDC source — operator S1/S2/S3 of SURVEY.md §2.1
  * as a real `MicroBatchStream` with its own offset management and
  * database/table filter pushdown (`SupportsPushDownFilters`).
  *
  * `spark.readStream.format("graft-cdc").option("path", dir)` over a
  * directory of append-only binlog segment files (`*.jsonl`, one
  * `RawBinlogEvent` JSON per line, segment names monotonic like MySQL's
  * `binlog.000001` …). The live-MySQL variant plugs in behind the same
  * offsets; this build environment has no MySQL client (SURVEY.md §7.4).
  *
  * Semantics mirrored from the reference:
  *   - offset = (segment file, line) — the (`PositionName`, `PositionPos`)
  *     pair of `pkg/shared.go:12-14`, serialized as JSON into Spark's
  *     checkpoint WAL (the badger analog, `storage.go:33-86`);
  *   - `startingOffsets=latest` reproduces `SHOW MASTER STATUS` seeding (S2,
  *     `baseinfo.go:254-262`); `earliest` replays the log;
  *   - checkpoint restart resumes from the last committed offset (S3) — the
  *     `GetPos` recovery path (`concurrently_task_manager.go:33-63`) for
  *     free;
  *   - pushed `database`/`table` equality filters are applied BEFORE JSON
  *     decoding completes (the F1/F2 fast path of `process.go:40-59`) so
  *     non-matching tables are never materialized — the DSv2 analog of the
  *     reference's cheapest-first predicate ordering.
  *
  * Scale: one input partition per segment span keeps intra-segment order
  * (the reference's single-thread guarantee, `sync.go:105`) while distinct
  * segments read in parallel.
  */
final class CdcSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new CdcTable(properties.asScala.toMap)
}

object CdcSource {
  /** Same shape as [[graft.model.RawBinlogEvent]] (kept in sync by spec). */
  val Schema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("logPos", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("eventType", StringType),
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("rows", ArrayType(ArrayType(StringType))),
    StructField("query", StringType),
    StructField("errorCode", IntegerType, nullable = false),
    StructField("nextLogName", StringType),
    StructField("position", LongType, nullable = false)))

  /** Ordered segment list (binlog rotation order = name order). */
  def segments(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".jsonl"))
      .toSeq.sortBy(_.getFileName.toString)

  def lineCount(p: Path): Long = {
    val in = Files.newBufferedReader(p, StandardCharsets.UTF_8)
    try Iterator.continually(in.readLine()).takeWhile(_ != null).size.toLong
    finally in.close()
  }

  /** Incremental line counter for append-only segments. `latestOffset`
    * runs on EVERY micro-batch trigger; a full re-read of the tail segment
    * (O(segment bytes) of driver I/O per trigger) makes the driver the
    * bottleneck once segments grow. This index caches
    * (consumed bytes, newline count, trailing-newline flag) per segment
    * and scans only the appended suffix — an unchanged tail costs one
    * `stat`. Line semantics match [[lineCount]] (a trailing unterminated
    * line counts as a line; binlog fixtures are `\n`-terminated JSONL).
    *
    * `bytesScanned` is the observability seam the spec asserts on: a
    * trigger loop over a static segment must not re-read it.
    */
  final class SegmentLineIndex {
    private final case class Entry(bytes: Long, newlines: Long, endsNl: Boolean)
    private val cache = scala.collection.concurrent.TrieMap[String, Entry]()
    val bytesScanned = new java.util.concurrent.atomic.AtomicLong(0L)

    private def toLines(e: Entry): Long =
      e.newlines + (if (!e.endsNl && e.bytes > 0) 1L else 0L)

    def lines(p: Path): Long = {
      val size = Files.size(p)
      // a shrunk file (not append-only after all) falls back to a full scan
      val prev = cache.get(p.toString).filter(_.bytes <= size)
        .getOrElse(Entry(0L, 0L, endsNl = true))
      if (size == prev.bytes) toLines(prev)
      else {
        val in = Files.newInputStream(p)
        try {
          var toSkip = prev.bytes
          var skipFailed = false
          while (toSkip > 0 && !skipFailed) {
            val n = in.skip(toSkip)
            if (n <= 0) skipFailed = true else toSkip -= n
          }
          if (skipFailed) {
            // couldn't reach the cached offset (file replaced/truncated
            // between stat and read) — never count from an unknown
            // position; drop the entry and rescan from zero next call
            cache.remove(p.toString)
            return CdcSource.lineCount(p)
          }
          var total = prev.bytes
          var newlines = prev.newlines
          var endsNl = prev.endsNl
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          while (n > 0) {
            var i = 0
            while (i < n) { if (buf(i) == '\n') newlines += 1; i += 1 }
            endsNl = buf(n - 1) == '\n'
            total += n
            n = in.read(buf)
          }
          bytesScanned.addAndGet(total - prev.bytes)
          val e = Entry(total, newlines, endsNl)
          cache.put(p.toString, e)
          toLines(e)
        } finally in.close()
      }
    }
  }
}

final class CdcTable(properties: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-cdc:${properties.getOrElse("path", "?")}"
  override def schema(): StructType = CdcSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CdcScanBuilder(
      options.asScala.toMap ++ properties)
}

final class CdcScanBuilder(options: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters {

  private var pushedDbs: Option[Set[String]] = None
  private var pushedTables: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("database", _: String) | EqualTo("table", _: String) => true
      case In("database", vs) => vs.forall(_.isInstanceOf[String])
      case In("table", vs)    => vs.forall(_.isInstanceOf[String])
      case _                  => false
    }
    accepted.foreach {
      case EqualTo("database", v: String) => pushedDbs = Some(Set(v))
      case EqualTo("table", v: String)    => pushedTables = Some(Set(v))
      case In("database", vs) =>
        pushedDbs = Some(vs.map(_.asInstanceOf[String]).toSet)
      case In("table", vs) =>
        pushedTables = Some(vs.map(_.asInstanceOf[String]).toSet)
      case _ => ()
    }
    pushed = accepted
    // also return accepted as residual: string compare is cheap and keeps
    // Spark's post-scan semantics exact even for nulls
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new CdcScan(options, pushedDbs, pushedTables)
}

final class CdcScan(options: Map[String, String],
    dbs: Option[Set[String]], tables: Option[Set[String]]) extends Scan {

  private def dir: Path =
    Paths.get(options.getOrElse("path",
      throw new IllegalArgumentException("graft-cdc requires option 'path'")))

  override def readSchema(): StructType = CdcSource.Schema
  override def description(): String =
    s"graft-cdc scan of $dir (pushed dbs=$dbs tables=$tables)"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      CdcSource.segments(dir).map(p =>
        CdcInputPartition(p.toString, 0L, Long.MaxValue): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new CdcReaderFactory(dbs, tables)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcMicroBatchStream(dir, options, dbs, tables)
}

/** Offset = position in the ordered segment list: (segment name, line). An
  * empty name means "before the first segment". JSON-serialized into the
  * checkpoint WAL.
  */
final case class CdcOffset(segment: String, line: Long) extends Offset {
  override def json(): String = MiniJson.render(MiniJson.JObj.of(
    "segment" -> MiniJson.str(segment), "line" -> MiniJson.num(line)))
}

object CdcOffset {
  val Beginning: CdcOffset = CdcOffset("", 0L)
  def fromJson(s: String): CdcOffset = {
    val v = MiniJson.parse(s).fold(e => throw new IllegalArgumentException(e), identity)
    CdcOffset((v \ "segment").flatMap(_.asString).getOrElse(""),
      (v \ "line").flatMap(_.asLong).getOrElse(0L))
  }
}

final case class CdcInputPartition(path: String, fromLine: Long, toLine: Long)
    extends InputPartition

final class CdcMicroBatchStream(dir: Path, options: Map[String, String],
    dbs: Option[Set[String]], tables: Option[Set[String]])
    extends MicroBatchStream
    // SupportsTriggerAvailableNow (extends SupportsAdmissionControl) is
    // implemented NATIVELY: Spark's fallback AvailableNowDataStreamWrapper
    // returns the captured end offset from latestOffset(start, limit) and
    // DROPS the read limit — the same reason the Kafka and file sources
    // implement the interface themselves rather than rely on the wrapper.
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  /** End bound captured at Trigger.AvailableNow start: batches drain up
    * to here (paced by the read limit), then the query self-terminates;
    * data appended mid-run waits for the next invocation.
    */
  @volatile private var availableNowCap: Option[CdcOffset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(latestOffset().asInstanceOf[CdcOffset])

  /** per-stream incremental tail index: unchanged segments cost one stat
    * per trigger, grown ones scan only the appended suffix
    */
  private val lineIndex = new CdcSource.SegmentLineIndex

  /** `maxLinesPerTrigger` — admission control / backpressure: caps how
    * many binlog lines one micro-batch admits, the analog of the Kafka
    * source's `maxOffsetsPerTrigger` and the reference's bounded event
    * channel. Without a cap, a restart against a deep backlog plans ONE
    * giant catch-up batch (checkpoint progress, state growth and retry
    * granularity all suffer); with it, catch-up proceeds in bounded,
    * individually-committed steps. Keys arrive lowercased via
    * `CaseInsensitiveStringMap`.
    */
  private val maxLinesPerTrigger: Option[Long] =
    options.get("maxlinespertrigger").map(_.toLong)

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    maxLinesPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())
  }

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val avail = availableNowCap
      .getOrElse(latestOffset().asInstanceOf[CdcOffset])
    limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        cappedOffset(start.asInstanceOf[CdcOffset], avail, r.maxRows())
      case _ => avail
    }
  }

  /** True head of the stream regardless of the cap — drives the
    * `latestOffset` progress metric so backlog depth stays observable
    * while admission control paces consumption.
    */
  override def reportLatestOffset(): Offset = latestOffset()

  /** Walk segments from `start`, spending at most `budget` lines, and
    * return the capped end offset. Per-segment line totals come from the
    * incremental index (one stat per unchanged segment).
    */
  private def cappedOffset(
      start: CdcOffset, avail: CdcOffset, budget0: Long): CdcOffset = {
    if (avail.segment.isEmpty) return avail
    var budget = math.max(budget0, 1L) // always admit progress
    var resSeg = start.segment
    var resLine = start.line
    val segs = CdcSource.segments(dir)
    val it = segs.iterator
    while (budget > 0 && it.hasNext) {
      val p = it.next()
      val name = p.getFileName.toString
      val inRange =
        (start.segment.isEmpty || name >= start.segment) && name <= avail.segment
      if (inRange) {
        val total =
          if (name == avail.segment) avail.line else lineIndex.lines(p)
        val from = if (name == start.segment) start.line else 0L
        val take = math.min(budget, math.max(total - from, 0L))
        if (take > 0) {
          resSeg = name
          resLine = from + take
          budget -= take
        } else if (name > resSeg || resSeg.isEmpty) {
          // fully-consumed segment: advance the pointer past it so the
          // next batch doesn't replan an empty range
          resSeg = name
          resLine = total
        }
      }
    }
    if (resSeg.isEmpty) avail else CdcOffset(resSeg, resLine)
  }

  /** S2 + the reference's dropped `start_time` backfill
    * (`README.md:75`, `pkg/req_resp.go:72` — "very performance hungry"
    * there because it replays unpaced): `startingOffsets` accepts
    *   - `latest`   — SHOW MASTER STATUS seeding (tail only);
    *   - `earliest` — full-log replay;
    *   - `{"segment":"...","line":N}` — bounded historical backfill from
    *     an explicit (segment, line). What made it performance-hungry in
    *     the reference is exactly what admission control fixes here: the
    *     catch-up drains as maxLinesPerTrigger-bounded, individually
    *     committed micro-batches, then hands off to live tailing through
    *     the same offset walk — no special backfill mode to exit.
    * Only the INITIAL run consults this; a checkpoint restart resumes
    * from the WAL (S3) as always.
    */
  override def initialOffset(): Offset = {
    val raw = options.getOrElse("startingOffsets",
      options.getOrElse("startingoffsets", "earliest")).trim
    if (raw.startsWith("{")) {
      // fail fast: fromJson defaults missing keys to ("", 0) == Beginning,
      // so a typo like {"seg":...} would silently become the unpaced
      // full-log replay that bounded backfill exists to prevent
      val o = CdcOffset.fromJson(raw)
      require(o.segment.nonEmpty,
        s"""startingOffsets JSON must carry a non-empty "segment" """ +
          s"""(got: $raw); use startingOffsets=earliest for a full replay""")
      o
    }
    else raw.toLowerCase match {
      case "latest" => latestOffset() // S2: SHOW MASTER STATUS seeding
      case _        => CdcOffset.Beginning
    }
  }

  override def latestOffset(): Offset = {
    val segs = CdcSource.segments(dir)
    if (segs.isEmpty) CdcOffset.Beginning
    else {
      val last = segs.last
      CdcOffset(last.getFileName.toString, lineIndex.lines(last))
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcOffset]
    val e = end.asInstanceOf[CdcOffset]
    val segs = CdcSource.segments(dir)
    segs.flatMap { p =>
      val name = p.getFileName.toString
      val afterStart = s.segment.isEmpty || name >= s.segment
      val beforeEnd = e.segment.nonEmpty && name <= e.segment
      if (!afterStart || !beforeEnd) None
      else {
        val from = if (name == s.segment) s.line else 0L
        val to = if (name == e.segment) e.line else Long.MaxValue
        if (from >= to) None
        else Some(CdcInputPartition(p.toString, from, to): InputPartition)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(dbs, tables)

  override def deserializeOffset(json: String): Offset = CdcOffset.fromJson(json)
  override def commit(end: Offset): Unit = () // WAL-committed by the engine
  override def stop(): Unit = ()
}

final class CdcReaderFactory(dbs: Option[Set[String]],
    tables: Option[Set[String]]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcInputPartition]
    new CdcPartitionReader(p, dbs, tables)
  }
}

/** Streams one segment span; pushed db/table filters short-circuit on the
  * cheap fields before row materialization.
  */
final class CdcPartitionReader(part: CdcInputPartition,
    dbs: Option[Set[String]], tables: Option[Set[String]])
    extends PartitionReader[InternalRow] {

  private val reader =
    Files.newBufferedReader(Paths.get(part.path), StandardCharsets.UTF_8)
  private var lineNo = 0L
  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null) {
      val line = reader.readLine()
      if (line == null) return false
      if (lineNo >= part.toLine) return false
      val take = lineNo >= part.fromLine
      lineNo += 1
      if (take && line.trim.nonEmpty) {
        MiniJson.parse(line) match {
          case Right(v) if passes(v) => current = toRow(v)
          case _                     => () // skip filtered / malformed
        }
      }
    }
    true
  }

  private def passes(v: JValue): Boolean = {
    def ok(field: String, allowed: Option[Set[String]]): Boolean =
      allowed.forall(set =>
        (v \ field).flatMap(_.asString).exists(set.contains))
    ok("database", dbs) && ok("table", tables)
  }

  private def utf8(v: Option[JValue]): UTF8String =
    v.flatMap(_.asString).map(UTF8String.fromString).orNull

  private def toRow(v: JValue): InternalRow = {
    val rows = (v \ "rows").flatMap(_.asArr).getOrElse(Vector.empty).map { r =>
      new GenericArrayData(r.asArr.getOrElse(Vector.empty)
        .map(c => c.asString.map(UTF8String.fromString).orNull).toArray[Any])
    }
    new GenericInternalRow(Array[Any](
      utf8(v \ "file"),
      (v \ "logPos").flatMap(_.asLong).getOrElse(0L),
      (v \ "timestamp").flatMap(_.asLong).getOrElse(0L),
      utf8(v \ "eventType"),
      utf8(v \ "database"),
      utf8(v \ "table"),
      new GenericArrayData(rows.toArray[Any]),
      utf8(v \ "query"),
      (v \ "errorCode").flatMap(_.asLong).getOrElse(0L).toInt,
      utf8(v \ "nextLogName"),
      (v \ "position").flatMap(_.asLong).getOrElse(0L)))
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
