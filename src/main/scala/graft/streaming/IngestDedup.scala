package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.analytics.DedupQueries

/** One raw document arriving on the ingest stream. */
final case class IngestDoc(doc_id: Long, text: String)

/** One embedding vector arriving on the ingest stream. */
final case class IngestVec(vec_id: Long, embedding: Seq[Float])

/** Streaming ingest dedup — "dedup the firehose against the lake": each
  * micro-batch of arriving documents computes its MinHash signatures
  * batch-locally, probes the STANDING corpus's LSH band index by
  * equi-join, and exact-verifies the candidates — the streaming face of
  * the batch `q_dedup_incremental` (whose DuckDB oracle therefore also
  * pins THIS pipeline's semantics; `IngestDedupSpec` asserts the parity).
  *
  * Scale shape, per batch: O(|batch|) signature build, a band equi-join
  * against the (bucketed, persisted) corpus index, and a verify join
  * whose width is bounded by the match count — the corpus is never
  * re-paired with itself, so steady-state ingest cost is independent of
  * corpus size beyond the index probe. Delivery is Spark's at-least-once
  * `foreachBatch`: a replayed batch re-derives the identical pair rows
  * (pure derivation, deterministic signatures), so any keyed/idempotent
  * downstream sink (the `UpsertStore` pattern, a MERGE target keyed on
  * (corpus_id, new_id)) yields exactly-once EFFECT — the same contract as
  * [[EventStreams.upsertLatest]].
  */
object IngestDedup {

  /** Start the ingest-dedup stream: `sink` receives each micro-batch's
    * verified (corpus_id, new_id, jaccard) pairs plus the batch id.
    * `corpusPer` is the standing corpus signature frame — at scale, a
    * persisted index table; callers typically `.persist()` it so every
    * batch probes memory, not the lake.
    */
  def dedupIngest(docs: Dataset[IngestDoc], corpusPer: DataFrame,
      checkpointDir: String,
      shape: graft.analytics.DedupIndex.Shape =
        graft.analytics.DedupIndex.Shape.Oracle)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: Dataset[IngestDoc], batchId: Long) =>
        sink(DedupQueries.incrementalPairs(corpusPer,
          DedupQueries.signaturesOf(batch.toDF(), shape.slots), shape),
          batchId)
      }
      .start()

  /** The EMBEDDING counterpart of [[dedupIngestFromIndex]]: each
    * micro-batch of arriving vectors probes the persisted
    * [[graft.analytics.SrpIndex]] band artifact — the streaming face of
    * the oracled `q_dedup_embedding_incremental`, same per-batch
    * O(|batch| + matches) shape and the same at-least-once/foreachBatch
    * delivery contract as the text face. The index tables (and the band
    * shape the artifact records) are resolved ONCE at stream start and
    * persisted for the query's life — every batch probes memory, not the
    * lake — with the same listener-released cache lifecycle as the text
    * face (`IngestDedupSpec` pins the single artifact load).
    */
  def dedupIngestEmbeddings(vecs: Dataset[IngestVec], indexDir: String,
      checkpointDir: String)(sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = vecs.sparkSession
    val loaded = graft.analytics.SrpIndex.load(spark, indexDir)
    loaded.vectors.persist(); loaded.bands.persist()
    val start = () => vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: Dataset[IngestVec], batchId: Long) =>
        sink(graft.analytics.SrpIndex.probeLoaded(loaded, batch.toDF()),
          batchId)
      }
      .start()
    withCacheLifecycle(spark, start,
      Seq(loaded.vectors, loaded.bands))
  }

  /** [[dedupIngest]] with the corpus side loaded from a persisted
    * [[graft.analytics.DedupIndex]] artifact — the production wiring:
    * the stream probes the durable index built at corpus ingest, banded
    * at the shape the ARTIFACT records (never a caller guess), cached
    * once for the life of the query so every batch probes memory, not
    * the lake. The cache entry lives as long as the query; it is
    * released when the returned query stops (listener below), so a
    * service that cycles many ingest streams does not accrete corpus
    * caches.
    */
  def dedupIngestFromIndex(docs: Dataset[IngestDoc], indexDir: String,
      checkpointDir: String)(sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = docs.sparkSession
    val shape = graft.analytics.DedupIndex.shapeOf(indexDir)
    val corpusPer = spark.read.parquet(
      graft.analytics.DedupIndex.tablePath(indexDir, "signatures")).persist()
    withCacheLifecycle(spark,
      () => dedupIngest(docs, corpusPer, checkpointDir, shape)(sink),
      Seq(corpusPer))
  }

  /** Start a query whose batches probe `cached` persisted frames, and tie
    * the cache entries' lifetime to the query's: released on termination
    * (listener), and on a failed start — if start() throws, the listener
    * is never attached and the corpus-sized entries would leak for the
    * session's life.
    */
  private def withCacheLifecycle(spark: org.apache.spark.sql.SparkSession,
      start: () => StreamingQuery,
      cached: Seq[DataFrame]): StreamingQuery = {
    val query =
      try start()
      catch { case e: Throwable => cached.foreach(_.unpersist()); throw e }
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit =
          if (e.id == query.id) {
            cached.foreach(_.unpersist())
            spark.streams.removeListener(this)
          }
      })
    query
  }
}
