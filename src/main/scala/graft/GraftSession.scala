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
      // cached-plan AQE stays at the Spark default (OFF) — measured both
      // ways in r22: letting AQE re-plan cache fills fixed the tiny-loop
      // rows (components ×0.40 — each iteration's cached label table had
      // run 32 one-row tasks per wave, the r21 8-vs-32-core inversion)
      // but collapsed the cache fills whose by-column repartition exists
      // to parallelize an EXPLODING stage the pre-explode stats cannot
      // price (contain_build 0.45 → 4.3 s, q_dedup_containment → 12.5 s,
      // q_dedup_simhash ×2.7). The losses dwarf the wins, so the loops
      // size their own cached partitioning from materialized counts
      // instead (see GraphQueries/DedupQueries componentsOf), and the
      // spread-before-explode sites pin explicit counts. Env knob kept
      // for interleaved A/Bs.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "false"))
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
      // keep bucketed SCANS on even when no operator needs the bucket
      // partitioning: the auto-disable rule considers only interesting
      // partitioning/ordering, NOT bucket pruning, so it silently turns
      // the unified index artifacts' pruned micro probes
      // (SelectedBucketsCount k out of n) back into full scans. Our
      // bucketBy tables are index artifacts read via joins or pruned
      // probes — both want the bucketed scan — and AQE coalescing covers
      // the one cost (per-bucket read parallelism on small full scans).
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
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
    * `events.ts` has been regenerated by the driver under more than one
    * physical encoding, so normalize it to a session-TZ TimestampType here
    * once, instead of letting each query discover the surprise:
    *   - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it;
    *     with `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    *     [[builder]]) it lands as LongType nanos → `timestamp_micros`.
    *   - parquet timestamp[us] with isAdjustedToUTC=false (the current
    *     encoding, since 2026-08-13): Spark 4.x reads TIMESTAMP_NTZ, which
    *     NTZ-strict functions (`unix_millis`, …) refuse → cast to
    *     TimestampType. The session TZ is pinned to UTC, so the cast is
    *     the identity on the wall-clock value and oracles agree.
    * Either conversion is a codegen'd scalar expression; pushdown/pruning
    * on other columns is unaffected.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.dataType == LongType && isTsColumn(name, f.name) =>
        // Integral `div`, not `/`: epoch-nanos (~1.7e18) exceeds double's
        // 2^53 mantissa, so float division rounds the microsecond.
        d.withColumn(f.name,
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr(s"${f.name} div 1000")))
      case (d, f) if f.dataType == TimestampNTZType =>
        d.withColumn(f.name, d(f.name).cast(TimestampType))
      case (d, _) => d
    }
  }

  /** Only `events.ts` has ever been nano-encoded in the driver data. */
  private def isTsColumn(table: String, col: String): Boolean =
    table == "events" && col == "ts"
}
