package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.MQEvent

/** CDC → queryable CURRENT-STATE table — the downstream-consumer half the
  * reference promises but stubs out (`internal/mq_manager/{nsq,es,mongodb}`
  * are `panic("implement me")`): every one of those sinks exists to keep an
  * external store's row-state in sync with the stream. This is that
  * materialization, Spark-native: per micro-batch, reduce the envelopes to
  * the latest change per (table, primary key) and MERGE into a versioned
  * parquet serving table with an atomically-swapped snapshot pointer (same
  * layout as [[EventStreams.ParquetUpsertStore]]; a Delta/Iceberg MERGE or
  * an ES/Mongo bulk-upsert replaces the store without touching the merge
  * contract).
  *
  * Semantics:
  *   - key = the configured primary-key column per `db.table` (the
  *     reference pushes that knowledge to consumers; here it is the one
  *     piece of configuration the materializer needs);
  *   - version = (event timestamp, segment, logPos) — the binlog emission
  *     order ACROSS file rotation: logPos resets on rotate and timestamps
  *     are second-granularity, so the segment name (lexicographic =
  *     rotation order, see [[graft.model.EventHeader]]) breaks the
  *     intra-second tie a rotation can produce. Idempotent under
  *     at-least-once redelivery and batch reordering by the same
  *     last-writer-wins rule as the SCD1 sink. On a FULL version tie (the
  *     same physical event redelivered) the struct-max falls through to
  *     (action, after_json) — deterministic, and a no-op because a
  *     redelivered event carries identical values there too;
  *   - DELETE is a first-class tombstone: the latest version wins
  *     INCLUDING deletes, and [[CdcServingTable.snapshot]] excludes
  *     tombstoned rows — a re-insert after a delete resurrects the key
  *     (newer version) while a redelivered stale insert cannot;
  *   - the after image rides as the envelope's JSON face (`after_json`) so
  *     the serving row set has ONE fixed schema under DDL evolution —
  *     consumers recover typed views via `from_json` + the registry
  *     snapshot, the same contract as the wire envelope.
  *
  * Scale shape: the snapshot is PARTITIONED BY `tbl` and a merge is
  * partition-pruned copy-on-write — one shuffle on (table, pk) over
  * |touched-table store rows| + |batch| rows (the `tbl IN touched` filter
  * prunes untouched partition directories at the scan), with every
  * untouched table's files carried into the new version as hard links
  * ([[VersionedStore.linkUntouchedPartitions]] — zero data copied). A
  * quiet table costs nothing per merge no matter how large the store
  * grows; a table format's partition-pruned MERGE replaces the link step
  * as a configuration change. The only driver-side materialization is the
  * touched TABLE NAME list — bounded by the task's table count, never by
  * row count.
  */
final class CdcServingTable(dir: String, pkOf: Map[String, String]) {

  private def currentVersion: Option[Long] = VersionedStore.currentVersion(dir)

  /** Store schema, declared explicitly on every read: `tbl` is the
    * PARTITION column of the snapshot layout, and inference would happily
    * type a numeric-looking `tbl=1.2` directory as DOUBLE.
    */
  private val storeSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("tbl", StringType), StructField("pk", StringType),
      StructField("ver_ts", LongType), StructField("ver_seg", StringType),
      StructField("ver_pos", LongType),
      StructField("action", StringType),
      StructField("after_json", StringType)))
  }

  /** Full store content incl. tombstones (for merge + forensics). */
  def raw(spark: SparkSession): DataFrame = currentVersion match {
    case Some(v) => spark.read.schema(storeSchema).parquet(s"$dir/v$v")
    case None =>
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], storeSchema)
  }

  /** The serving view: one LIVE row per key (tombstones excluded). */
  def snapshot(spark: SparkSession): DataFrame =
    raw(spark).filter(col("action") =!= "delete")
      .select(col("tbl"), col("pk"), col("after_json"))

  /** Reduce a batch of envelopes to the latest change per key and merge.
    * Tables without a configured pk are ignored (filter-first: they never
    * reach the shuffle).
    */
  def merge(envelopes: Dataset[MQEvent]): Unit = {
    val spark = envelopes.sparkSession
    val pkLit = typedlit(pkOf)
    val keyed = envelopes.toDF()
      .withColumn("tbl", concat_ws(".", col("database"), col("table")))
      .withColumn("pk_col", element_at(pkLit, col("tbl")))
      .filter(col("pk_col").isNotNull)
      // delete carries only the before image; its pk comes from there
      .withColumn("pk", element_at(
        when(col("action") === "delete", col("before")).otherwise(col("after")),
        col("pk_col")))
      .filter(col("pk").isNotNull)
      .select(col("tbl"), col("pk"),
        col("eventHeader.timestamp").as("ver_ts"),
        coalesce(col("eventHeader.segment"), lit("")).as("ver_seg"),
        col("eventHeader.logPos").as("ver_pos"),
        col("action"),
        to_json(col("after")).as("after_json"))
      // two consumers (touched-table list + the merge union) — one compute
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = keyed.select(col("tbl")).distinct()
        .collect().map(_.getString(0)).toSeq
      if (touched.nonEmpty) {
        // partition pruning: `tbl IN touched` on the tbl-partitioned read
        // means untouched tables' directories are never scanned
        val next = raw(spark).filter(col("tbl").isin(touched: _*))
          .unionByName(keyed)
          // struct max = last-writer-wins on (ver_ts, ver_seg, ver_pos) —
          // the rotation-safe emission order; action and the JSON image
          // ride as deterministic tiebreaks (maps are not orderable, their
          // JSON face is), reached only when the same physical event is
          // redelivered
          .groupBy(col("tbl"), col("pk"))
          .agg(max(struct(col("ver_ts"), col("ver_seg"), col("ver_pos"),
            col("action"), col("after_json"))).as("v"))
          .select(col("tbl"), col("pk"), col("v.ver_ts"), col("v.ver_seg"),
            col("v.ver_pos"), col("v.action"), col("v.after_json"))
        val prev = currentVersion
        val v = prev.getOrElse(-1L) + 1L
        next.write.mode("overwrite").partitionBy("tbl").parquet(s"$dir/v$v")
        prev.foreach(pv => VersionedStore.linkUntouchedPartitions(
          new java.io.File(dir, s"v$pv"), new java.io.File(dir, s"v$v")))
        VersionedStore.swapPointer(dir, v)
      }
    } finally { keyed.unpersist(); () }
  }

  /** Drop snapshot versions older than the newest `keep` (the pointer's
    * target is always kept) — the compaction-GC a long-running sink needs.
    * Hard-linked carried files survive in newer versions.
    */
  def prune(keep: Int = 2): Unit = VersionedStore.prune(dir, keep)
}
