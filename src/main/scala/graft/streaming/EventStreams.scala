package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the stream (the streaming face of the driver's `events`
  * table / of the CDC envelope's event-time surface).
  */
final case class StreamEvent(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** A closed user session emitted by the stateful sessionizer. */
final case class UserSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    sum_value: Double)

/** Accumulating state for one user's open session. */
final case class SessionState(
    start: Long, last: Long, n: Long, sum: Double)

/** Event-time streaming operators (Structured Streaming): watermarked
  * tumbling/sliding windows and custom-state sessionization — the streaming
  * faces of [[graft.analytics.EventsQueries]], proven equivalent by
  * `EventStreamsSpec`.
  *
  * Scale notes:
  *   - windowed aggregation state is keyed (window, event_type) — bounded by
  *     the watermark horizon, evicted as the watermark passes; at 1000
  *     executors state shards across partitions by group key;
  *   - sessionization uses `flatMapGroupsWithState` with an event-time
  *     timeout: state per user is O(1) (start/last/count/sum — no event
  *     buffer), the pattern that survives 100 M live keys.
  */
object EventStreams {

  /** Tumbling 1-hour window counts per event type with a 2-hour watermark
    * (late rows beyond it are dropped; state is evicted past it).
    */
  def tumblingCounts(events: Dataset[StreamEvent]): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n", $"sum_value")
  }

  /** Sliding 1-hour window every 15 minutes (overlapping assignment). */
  def slidingCounts(events: Dataset[StreamEvent]): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("window_start"), $"event_type", $"n")
  }

  /** Native gap-based session windows (`session_window`, 30-minute gap):
    * the BUILT-IN alternative to [[sessionize]] for plain per-session
    * aggregates — Spark merges overlapping candidate windows in the
    * streaming state store and closes a session when the watermark passes
    * its end; state per open session is the aggregation buffer only.
    * Reach for [[sessionize]] (`flatMapGroupsWithState`) only when the
    * per-session logic outgrows declarative aggregates. Gap semantics:
    * a gap of EXACTLY 30 minutes starts a new session (windows merge on
    * overlap, i.e. strict `<`), which is what the batch oracle of
    * `q_events_session_window` encodes.
    */
  def sessionWindowAgg(events: Dataset[StreamEvent]): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("sum_value"))
      .select($"user_id", $"w.start".as("session_start"),
        $"n_events", $"sum_value")
  }

  /** Streaming EXACT dedup by event id with BOUNDED state:
    * `dropDuplicatesWithinWatermark` keeps a key's fingerprint only until
    * the watermark passes it, so state is O(keys-per-watermark-horizon),
    * not O(all keys ever) — the property that keeps a 100 TB/day ingest
    * pipeline's state store finite. Duplicates arriving within the
    * 2-hour horizon are suppressed; a duplicate arriving later than the
    * horizon is by definition out of contract (at-least-once upstream is
    * expected to redeliver promptly).
    */
  def dedupById(events: Dataset[StreamEvent]): Dataset[StreamEvent] =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming CONTENT dedup: fingerprint = hash of the full semantic
    * payload INCLUDING event time (ts, user, type, value) but excluding
    * the delivery id — so an upstream redelivery under a fresh event_id is
    * suppressed, while a user legitimately repeating the same action later
    * (same user/type/value, different ts) is NOT treated as a duplicate.
    * The streaming face of the batch exact-dedup (`q_dedup_exact`), same
    * bounded-state mechanics as [[dedupById]].
    */
  def dedupByContent(events: Dataset[StreamEvent]): Dataset[StreamEvent] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .withColumn("fp",
        xxhash64($"ts", $"user_id", $"event_type", $"value"))
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")
      .as[StreamEvent]
  }

  /** Stream-static enrichment: the static dimension is broadcast once and
    * probed per micro-batch — no stream-side state, no shuffle of the
    * stream. The shape for joining a 100 TB/day stream with a reference
    * table that fits an executor (the common case for dims).
    */
  def enrich(events: Dataset[StreamEvent], dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Stream-stream interval join: each purchase matches the same user's
    * clicks at most 30 minutes earlier. Both sides carry watermarks and
    * the join condition bounds event-time distance in BOTH directions, so
    * the state store holds only the 30-minute horizon per side — the
    * constraint that makes a stream-stream join runnable forever. Emits in
    * Append mode once the watermark closes a match window.
    */
  def clickPurchaseJoin(events: Dataset[StreamEvent]): DataFrame = {
    import events.sparkSession.implicits._
    val clicks = events.toDF()
      .filter($"event_type" === "click")
      .withWatermark("ts", "1 hour")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"),
        $"ts".as("click_ts"))
    val purchases = events.toDF()
      .filter($"event_type" === "purchase")
      .withWatermark("ts", "1 hour")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
        $"ts".as("purchase_ts"), $"value".as("amount"))
    purchases.join(clicks,
      $"p_user" === $"c_user" &&
        $"click_ts" <= $"purchase_ts" &&
        $"click_ts" >= $"purchase_ts" - expr("INTERVAL 30 MINUTES"))
      .select($"purchase_id", $"p_user".as("user_id"), $"purchase_ts",
        $"amount", $"click_id", $"click_ts")
  }

  /** Windowed count-min sketch on the stream: one
    * [[graft.functions.CmsAgg]] sketch per tumbling hour — the streaming
    * face of the heavy-hitters pipeline. The custom aggregate's buffer
    * serializes into the streaming state store and its sum-merge is
    * exact, so cross-batch accumulation equals a batch build over the
    * same rows (pinned by `EventStreamsSpec`). State per window is the
    * FIXED sketch size (here 8 KiB), not the key cardinality — the point
    * of sketching a 100 TB/day stream.
    */
  def windowedCms(events: Dataset[StreamEvent]): DataFrame = {
    import events.sparkSession.implicits._
    graft.functions.CmsFunctions.register(events.sparkSession)
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(expr("graft_cms_agg(xxhash64(event_type), 256, 4)").as("cms"),
        count(lit(1)).as("n"))
      .select($"w.start".as("window_start"), $"cms", $"n")
  }

  /** Windowed approximate quantiles on the stream: GK-sketch percentiles
    * (p50/p90/p99 of `value`) per tumbling hour × event type — the
    * streaming face of the quantile path (`q_approx_percentile`), i.e.
    * the latency/size-percentile dashboards every event pipeline serves.
    * `approx_percentile` is an ImperativeAggregate with mergeable
    * partials, so its buffer lives in the streaming state store exactly
    * like the CMS sketch above; state per (window, type) is
    * O(accuracy), not O(rows) — the property that makes per-window
    * percentiles runnable on an unbounded stream. Accuracy here is the
    * production config (1000 ⇒ rank error ≤ N/1000); `EventStreamsSpec`
    * pins cross-batch accumulation ≡ one batch pass over the same rows.
    */
  def windowedPercentiles(events: Dataset[StreamEvent]): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(expr("approx_percentile(value, array(0.5, 0.9, 0.99), 1000)")
        .as("pcts"), count(lit(1)).as("n"))
      .select($"w.start".as("window_start"), $"event_type",
        element_at($"pcts", 1).as("p50"),
        element_at($"pcts", 2).as("p90"),
        element_at($"pcts", 3).as("p99"),
        $"n")
  }

  val SessionGapMs: Long = 30L * 60L * 1000L

  /** Gap-based sessionization with explicit state: a session closes when a
    * >30-min event-time gap arrives (or the state times out past the
    * watermark). Emits one row per CLOSED session. `OutputMode.Append`.
    */
  def sessionize(events: Dataset[StreamEvent]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[StreamEvent],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId, new Timestamp(s.start),
              new Timestamp(s.last), s.n, s.sum))
          } else {
            // within a micro-batch, order this user's rows by event time —
            // cross-batch disorder inside the gap is tolerated by design
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last > SessionGapMs =>
                  closed ::= UserSession(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case Some(s) =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
                    sum = s.sum + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the open session once the watermark passes gap's end
              state.setTimeoutTimestamp(s.last + SessionGapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** One upserted row in the keyed latest-state store. */
  final case class UserLatest(
      user_id: Long, ts_ms: Long, event_id: Long, value: Double)

  /** The versioned KV target of [[upsertLatest]] — last-writer-wins on the
    * (ts, event_id) version with a CAS loop, so applying the same batch
    * twice (at-least-once replay) or applying batches out of order
    * converges to the same state: the EFFECT is exactly-once even though
    * delivery is not. Test/demo implementation is a single-JVM concurrent
    * map (local-mode executors share the JVM); in production the same
    * merge contract is a Delta/Iceberg MERGE or a keyed JDBC/KV upsert —
    * the per-partition write parallelism and the version rule carry over
    * unchanged.
    */
  final class UpsertStore extends Serializable {
    // the store object ships into executor closures SERIALIZED — a plain
    // field would make each task write to its own copy. Only the id
    // travels; the backing map resolves through a JVM-global registry
    // (local-mode executors share the JVM — an external KV/Delta table
    // plays this role on a real cluster).
    private val id = java.util.UUID.randomUUID().toString
    private def map = UpsertStore.forId(id)
    @annotation.tailrec
    def put(row: UserLatest): Unit = {
      val cur = map.get(row.user_id)
      val newer = cur == null || row.ts_ms > cur.ts_ms ||
        (row.ts_ms == cur.ts_ms && row.event_id > cur.event_id)
      if (newer) {
        val ok =
          if (cur == null) map.putIfAbsent(row.user_id, row) == null
          else map.replace(row.user_id, cur, row)
        if (!ok) put(row)
      }
    }
    def snapshot: Map[Long, UserLatest] = {
      import scala.jdk.CollectionConverters._
      map.asScala.toMap
    }
    /** Drop this store's backing map from the JVM registry. The registry
      * holds state strongly until closed — a long-lived driver creating
      * stores per stream MUST close retired ones or their keyed state
      * leaks for the life of the JVM.
      */
    def close(): Unit = UpsertStore.release(id)
  }

  object UpsertStore {
    private val registry = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.ConcurrentHashMap[Long, UserLatest]]()
    private def forId(id: String) =
      registry.computeIfAbsent(id,
        _ => new java.util.concurrent.ConcurrentHashMap[Long, UserLatest]())
    private def release(id: String): Unit = registry.remove(id)
  }

  /** Merge one (micro-)batch into the store: reduce to ONE row per key
    * first (`max_by` the deterministic (ts, event_id) version — shrinks
    * the write set map-side before any store traffic), then upsert per
    * partition. Idempotent by the store's version rule.
    */
  /** Reduce a (micro-)batch to ONE row per key: `max` over the
    * deterministic (ts_ms, event_id) version struct — shrinks the write
    * set map-side before ANY store traffic. Shared by every upsert
    * target: the version rule lives here, stores only re-apply it.
    */
  def reduceLatest(batch: Dataset[StreamEvent]): Dataset[UserLatest] = {
    import batch.sparkSession.implicits._
    batch
      .groupBy($"user_id")
      // `.cast("timestamp")`: the source column may arrive as TIMESTAMP_NTZ
      // (the driver's parquet writes isAdjustedToUTC=false micros) and
      // unix_millis is NTZ-strict; with the session TZ pinned to UTC the
      // NTZ->TZ cast is the identity on the wall-clock value, so this
      // matches the oracle's epoch_ms(ts) exactly for either encoding.
      .agg(max(struct(unix_millis($"ts".cast("timestamp")).as("ts_ms"),
        $"event_id", $"value")).as("v"))
      .select($"user_id", $"v.ts_ms", $"v.event_id", $"v.value")
      .as[UserLatest]
  }

  def mergeBatch(batch: Dataset[StreamEvent], store: UpsertStore): Unit =
    reduceLatest(batch)
      .foreachPartition { (rows: Iterator[UserLatest]) =>
        rows.foreach(store.put)
      }

  /** The TABLE-backed upsert target — the same merge contract as
    * [[UpsertStore]] (last-writer-wins on the (ts_ms, event_id) version,
    * idempotent under replay and reordering) materialized as a versioned
    * parquet snapshot with an atomically-swapped pointer: the
    * dependency-free stand-in for `MERGE INTO` on a Delta/Iceberg serving
    * table. Merge = read current snapshot ∪ reduced batch → one
    * `max(version-struct)` per key → write v(N+1) → move the pointer
    * (rename is the atomic commit; readers either see vN or vN+1, never a
    * torn state; a crash between write and move leaves vN intact).
    *
    * Scale shape: the snapshot is PARTITIONED into `buckets` hash buckets
    * of user_id and the merge is partition-pruned copy-on-write — one
    * shuffle on user_id over |touched-bucket store rows| + |batch| rows
    * (the bucket filter prunes untouched directories at the scan), with
    * untouched buckets carried into the new version as hard links
    * ([[VersionedStore.linkUntouchedPartitions]] — zero data copied). A
    * trickle batch touching k buckets rewrites k/buckets of the store,
    * not all of it; `buckets` sizes the rewrite granularity (more buckets
    * = finer pruning, more small files — the classic table-format
    * trade). A table format with MERGE (partition-pruned copy-on-write /
    * merge-on-read deltas) replaces the link step without touching the
    * version rule or the sink wiring; that swap is configuration, not
    * code.
    */
  final class ParquetUpsertStore(dir: String, buckets: Int = 16)
      extends Serializable {
    require(buckets > 0, s"buckets must be positive, got $buckets")

    private def currentVersion: Option[Long] =
      VersionedStore.currentVersion(dir)

    private def bucketCol: org.apache.spark.sql.Column =
      pmod(hash(col("user_id")), lit(buckets))

    /** Bucketed store content; `bkt` is the partition column, declared
      * (not inferred) on the read. */
    private def raw(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("ts_ms", LongType),
        StructField("event_id", LongType), StructField("value", DoubleType),
        StructField("bkt", IntegerType)))
      currentVersion match {
        case Some(v) => spark.read.schema(schema).parquet(s"$dir/v$v")
        case None => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    }

    def snapshot(spark: org.apache.spark.sql.SparkSession): Dataset[UserLatest] = {
      import spark.implicits._
      raw(spark).select($"user_id", $"ts_ms", $"event_id", $"value")
        .as[UserLatest]
    }

    def merge(reduced: Dataset[UserLatest]): Unit = {
      val spark = reduced.sparkSession
      import spark.implicits._
      val batch = reduced.toDF().withColumn("bkt", bucketCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // driver-side list of touched BUCKET ids — bounded by `buckets`,
        // never by row count
        val touched = batch.select($"bkt").distinct()
          .collect().map(_.getInt(0)).toSeq
        if (touched.nonEmpty) {
          val next = raw(spark).filter($"bkt".isin(touched: _*))
            .unionByName(batch)
            .groupBy($"user_id")
            .agg(max(struct($"ts_ms", $"event_id", $"value")).as("v"))
            .select($"user_id", $"v.ts_ms", $"v.event_id", $"v.value")
            .withColumn("bkt", bucketCol)
          val prev = currentVersion
          val v = prev.getOrElse(-1L) + 1L
          // cluster on the bucket before the write — see CdcServingTable
          // .merge: without it every shuffle partition writes a file into
          // every bucket dir it holds rows for
          next.repartition($"bkt")
            .write.mode("overwrite").partitionBy("bkt").parquet(s"$dir/v$v")
          prev.foreach(pv => VersionedStore.linkUntouchedPartitions(
            new java.io.File(dir, s"v$pv"), new java.io.File(dir, s"v$v")))
          VersionedStore.swapPointer(dir, v)
        }
      } finally { batch.unpersist(); () }
    }
  }

  /** Streaming SCD1 upsert sink: keep the LATEST event per user in a
    * keyed store via `foreachBatch` merge — the pattern for materializing
    * CDC/event streams into serving tables. Complements the checkpoint
    * WAL: replayed batches re-merge harmlessly (see [[UpsertStore]]).
    */
  def upsertLatest(events: Dataset[StreamEvent], store: UpsertStore,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: Dataset[StreamEvent], _: Long) =>
        mergeBatch(batch, store)
      }
      .start()

  /** [[upsertLatest]] against the table-backed store — same contract,
    * serving-table-on-disk target.
    */
  def upsertLatestParquet(events: Dataset[StreamEvent],
      store: ParquetUpsertStore,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: Dataset[StreamEvent], _: Long) =>
        store.merge(reduceLatest(batch))
      }
      .start()
}
