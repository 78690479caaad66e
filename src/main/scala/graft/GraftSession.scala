package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table loading conventions shared by entry points.
  *
  * Scale notes (designed for a multi-executor cluster, tested on local[32]):
  *   - shuffle partitions default to 32 locally; on a real cluster this is
  *     overridden by AQE coalescing (`spark.sql.adaptive.enabled`), which
  *     re-plans post-shuffle partition counts from runtime statistics.
  *   - AQE skew-join splitting is enabled so a skewed key at 100 TB doesn't
  *     stall a single reducer.
  *   - broadcast threshold left at default (10 MB); dimension tables
  *     (region/nation/supplier/part at TPC-H ratios) stay broadcast-able at
  *     any SF because they grow sub-linearly vs. fact tables — we still hint
  *     `broadcast()` explicitly where the dimension is known small.
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // ObjectHashAggregate (typed aggregates like graft_minhash64,
      // collect_set) falls back to SORT-based aggregation after 128
      // distinct keys per partition by default — our per-doc aggregations
      // run thousands of keys per partition with small buffers, so raise
      // the bar (4096 keys × ~3 KB buffers ≈ 12 MB/partition, safe).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      // the generated-class cache holds 100 classes by default — a long
      // analytics session (the 100+-query bench/verify surface, or any
      // real multi-query workload) cycles far more distinct codegen units
      // than that, and several plans here embed large literal tables
      // (seeded hyperplanes, k-means centroids, PQ lookup tables) that
      // each occupy a unique unit. Once the cache thrashes, EVERY query
      // re-Janino-compiles its whole pipeline (measured: 2.8x on the
      // full-suite total — 385 s -> 139 s at sf0.1 — with short queries
      // individually inflated 10-40x at cache size 100).
      // Static conf — must be set before the session starts.
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // RocksDB-backed streaming state: state spills to local disk instead
      // of living on the heap — the store that survives 100 M live keys
      // per executor (watermarked windows, dedup fingerprints,
      // stream-stream join buffers). Changelog checkpointing keeps commit
      // cost proportional to the delta, not the store size.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val s = builder(appName).master(s"local[$cores]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Load one of the driver tables from a scale-factor dir. The read is a
    * plain parquet scan so Catalyst pushes filters/projection into it.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in [[builder]] and by
    * entry points) it lands as LongType nanos, which we convert back to a
    * proper TimestampType column (micros precision — the generator emits
    * second-granularity values, so nothing is lost). The conversion is a
    * codegen'd scalar expression: pushdown/pruning on other columns is
    * unaffected.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.dataType == org.apache.spark.sql.types.LongType &&
          isNanosColumn(sfDir, name, f.name) =>
        // Integral `div`, not `/`: epoch-nanos (~1.7e18) exceeds double's
        // 2^53 mantissa, so float division rounds the microsecond.
        d.withColumn(f.name,
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr(s"${f.name} div 1000")))
      case (d, _) => d
    }
  }

  /** Only `events.ts` is nano-encoded in the driver data. */
  private def isNanosColumn(sfDir: String, table: String, col: String): Boolean =
    table == "events" && col == "ts"
}
