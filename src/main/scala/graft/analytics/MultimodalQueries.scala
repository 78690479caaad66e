package graft.analytics

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.table

/** Opaque payload to decode — in production: JPEG/WAV/MP4 bytes. */
final case class MMRecord(
    doc_id: Long,
    modality: String,
    payload: Array[Byte],
    width: Long,
    sample_rate: Long)

/** Extracted features (the stub decoder's output contract). */
final case class MMFeatures(
    doc_id: Long,
    modality: String,
    n_bytes: Long,
    first_byte: Long,
    checksum: Long,
    frame_checksum: Long)

/** Multimodal-column operators (driver mandate): image/audio/video as
  * opaque `binary` columns with typed metadata, decode / feature-extract /
  * frame-sample plumbing.
  *
  * The container has no codec libraries, so the DECODE step is a
  * deterministic stub ([[StubDecoder]]) — but every piece of Spark plumbing
  * is real: a `BinaryType` payload column, a typed metadata struct, and the
  * batch-shaped per-partition decode (`Dataset[MMRecord].mapPartitions`,
  * the Scala analog of `mapInPandas` — one decoder instance per partition,
  * rows streamed through it, output re-entering Catalyst as a typed
  * Dataset). At 100 TB the decode stage is embarrassingly parallel and
  * partition-local: no shuffle enters or leaves it; the expensive bytes are
  * read once and reduced to a narrow feature row before anything wide
  * happens.
  *
  * Payloads here are the documents' UTF-8 bytes standing in for media bytes
  * (deterministic — the DuckDB oracle recomputes the same features straight
  * from `text`).
  */
object MultimodalQueries {

  /** Deterministic stand-in for a media decoder: derives features any real
    * decoder would (size, leading magic byte, content checksum, and a
    * frame-sampled checksum at 8 evenly-spaced offsets — the frame-sample
    * path of a video pipeline). Pure function of the payload bytes.
    */
  object StubDecoder extends Serializable {
    def decode(r: MMRecord): MMFeatures = {
      val s = new String(r.payload, StandardCharsets.UTF_8)
      val n = s.length.toLong
      val checksum = s.foldLeft(0L)((a, c) => a + c.toLong)
      val stride = math.max(n / 8, 1L)
      val frame = (0L until 8L).map { i =>
        val pos = i * stride // 0-based char offset
        if (pos < n) s.charAt(pos.toInt).toLong else 0L
      }.sum
      MMFeatures(r.doc_id, r.modality, n,
        if (n > 0) s.charAt(0).toLong else 0L, checksum, frame)
    }
  }

  /** Manifest of the multimodal table: payload + typed metadata, all
    * codegen'd column expressions (modality routing, byte size, fake
    * width/sample-rate derived deterministically from the payload size).
    */
  def qMmManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("payload"),
        length($"text").cast("long").as("n"))
      .select(
        $"doc_id",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          ($"doc_id" % 3 + 1).cast("int")).as("modality"),
        octet_length($"payload").cast("long").as("n_bytes"),
        (($"n" % 64) * 16).as("width"),
        (lit(8000L) * (($"n" % 3) + 1)).as("sample_rate"))
  }

  /** Decode + feature-extract through the typed per-partition batch path:
    * manifest → `Dataset[MMRecord]` → [[StubDecoder]] per partition →
    * `Dataset[MMFeatures]` → per-modality rollup (the only shuffle).
    */
  def qMmDecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val records = table(spark, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("payload"),
        length($"text").cast("long").as("n"))
      .select(
        $"doc_id",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          ($"doc_id" % 3 + 1).cast("int")).as("modality"),
        $"payload",
        (($"n" % 64) * 16).as("width"),
        (lit(8000L) * (($"n" % 3) + 1)).as("sample_rate"))
      .as[MMRecord]
    // batch-shaped decode: one decoder per partition, rows streamed through
    records.mapPartitions(it => it.map(StubDecoder.decode))
      .groupBy($"modality")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_bytes").as("sum_bytes"),
        sum($"checksum").as("sum_checksum"),
        sum($"frame_checksum").as("sum_frame_checksum"),
        min($"first_byte").as("min_first_byte"))
  }

  /** Fixed-size chunking (the media-chunk fan-out shape: audio frames /
    * image tiles / video GOPs): each payload explodes into 64-byte chunks
    * with a per-chunk Karp–Rabin fingerprint via the native
    * `graft_poly_hash` kernel. Scan-side explode — fan-out happens
    * partition-local BEFORE any shuffle, and the chunk table carries
    * (doc_id, chunk_no) so downstream chunk-level dedup/indexing can
    * shuffle on content, not payloads.
    */
  def qMmChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    table(spark, dir, "documents")
      .select($"doc_id", $"text")
      .select($"doc_id", explode(expr(
        "transform(sequence(0, cast(greatest(length(text) - 1, 0) div 64 as int))," +
          " i -> struct(i AS chunk_no, substring(text, i * 64 + 1, 64) AS chunk))"))
        .as("c"))
      .select($"doc_id",
        $"c.chunk_no".cast("long").as("chunk_no"),
        length($"c.chunk").cast("long").as("chunk_len"),
        expr("graft_poly_hash(c.chunk)").as("chunk_fp"))
  }

  /** Cross-asset duplicate-chunk detection — the media-dedup signal: for
    * each asset, how many of its distinct 64-byte chunks appear verbatim
    * in at least one OTHER asset (shared intro frames / boilerplate
    * headers / watermark tiles). Same one-pass shape as the document
    * span dedup: chunk fan-out is partition-local after a repartition on
    * doc_id, ONE shuffle on chunk content groups the (bounded,
    * dup-density-sized) asset lists, one shuffle on doc_id rolls up. No
    * self-join. Production variant chunks with a ROLLING Rabin boundary
    * (content-defined chunking, insert-resistant) and shuffles the
    * fingerprint, not the bytes — identical plan shape; fixed-size +
    * string chunks kept here so the oracle is byte-exact.
    */
  def qMmChunkDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    LinkageQueries.dupStats(
      table(spark, dir, "documents").select($"doc_id", $"text"),
      "transform(sequence(0, cast(greatest(length(text) - 1, 0) div 64 as int))," +
        " i -> substring(text, i * 64 + 1, 64))",
      unitPrefix = "chunk")
  }

  val queries: Map[String, CoreQueries.QFn] = Map(
    "q_mm_manifest" -> qMmManifest,
    "q_mm_decode_features" -> qMmDecodeFeatures,
    "q_mm_chunks" -> qMmChunks,
    "q_mm_chunk_dup" -> qMmChunkDup
  )

  val oracles: Map[String, String] = Map(
    "q_mm_manifest" ->
      """SELECT doc_id,
        | ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality,
        | octet_length(encode(text))::BIGINT AS n_bytes,
        | (length(text) % 64) * 16 AS width,
        | 8000 * ((length(text) % 3) + 1) AS sample_rate
        |FROM documents""".stripMargin,
    "q_mm_decode_features" ->
      """WITH f AS (
        |  SELECT doc_id,
        |   ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality,
        |   length(text)::BIGINT AS n_bytes,
        |   ascii(substr(text, 1, 1))::BIGINT AS first_byte,
        |   list_sum([ascii(c)::BIGINT FOR c IN string_split(text, '')]) AS checksum,
        |   list_sum([CASE WHEN i * greatest(length(text) // 8, 1) + 1 <= length(text)
        |     THEN ascii(substr(text, (i * greatest(length(text) // 8, 1) + 1)::INT, 1))
        |     ELSE 0 END FOR i IN range(0, 8)])::BIGINT AS frame_checksum
        |  FROM documents)
        |SELECT modality, count(*) AS n_docs, sum(n_bytes)::BIGINT AS sum_bytes,
        | sum(checksum)::BIGINT AS sum_checksum,
        | sum(frame_checksum)::BIGINT AS sum_frame_checksum,
        | min(first_byte) AS min_first_byte
        |FROM f GROUP BY 1""".stripMargin,
    "q_mm_chunks" ->
      """WITH c AS (
        |  SELECT doc_id,
        |   unnest(range(0, (greatest(length(text) - 1, 0) // 64) + 1)) AS chunk_no, text
        |  FROM documents),
        | s AS (
        |  SELECT doc_id, chunk_no,
        |   substr(text, (chunk_no * 64 + 1)::INT, 64) AS chunk
        |  FROM c)
        |SELECT doc_id, chunk_no::BIGINT AS chunk_no,
        | length(chunk)::BIGINT AS chunk_len,
        | list_reduce(list_prepend(7::BIGINT,
        |     [ascii(ch)::BIGINT FOR ch IN string_split(chunk, '') IF ch <> '']),
        |   (acc, ch) -> (acc * 31 + ch) % 2147483647) AS chunk_fp
        |FROM s""".stripMargin,
    "q_mm_chunk_dup" ->
      """WITH c AS (
        |  SELECT doc_id,
        |   unnest(range(0, (greatest(length(text) - 1, 0) // 64) + 1)) AS chunk_no, text
        |  FROM documents),
        | ck AS (
        |  SELECT DISTINCT doc_id,
        |   substr(text, (chunk_no * 64 + 1)::INT, 64) AS chunk
        |  FROM c),
        | cnt AS (SELECT chunk, count(*) AS nd FROM ck GROUP BY 1)
        |SELECT doc_id, count(*)::BIGINT AS n_chunks,
        | count(CASE WHEN nd > 1 THEN 1 END)::BIGINT AS n_dup_chunks,
        | count(CASE WHEN nd > 1 THEN 1 END)::DOUBLE / count(*) AS dup_frac
        |FROM ck JOIN cnt USING (chunk)
        |GROUP BY 1""".stripMargin
  )
}
