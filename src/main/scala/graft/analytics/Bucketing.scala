package graft.analytics

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables ONCE at write time so
  * every later equi-join / aggregation on the bucket key runs with no
  * exchange at all.
  *
  * The 100 TB arithmetic: a fact-to-fact join shuffles both inputs every
  * query (2 × table size of network per run); bucketing pays one shuffle
  * at ingest and amortizes it over every downstream query. Bucket count
  * should target ~128–512 MB per bucket file at the production scale; the
  * sort column keeps each bucket file merge-join-ready.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and sorted) by `key`. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      key: String,
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(tableName)

  /** Join two tables previously bucketed on the same key with the same
    * bucket count — planner elides both shuffles (and with sorted buckets,
    * both sorts) of the sort-merge join.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Write `df` hive-partitioned by `col` — the OTHER ingest-time layout
    * lever: bucketing elides the JOIN shuffle, directory partitioning
    * elides the SCAN. A reader filtering on the partition column touches
    * only the matching directories (partition PRUNING — `PartitionFilters`
    * in the scan node), so a day/tenant-scoped query over a 100 TB table
    * reads that day's files, not 100 TB. Choose a column whose
    * cardinality keeps files ≥ ~128 MB (date/tenant/event_type — never a
    * high-cardinality key, which degenerates into millions of tiny files
    * and a metadata-bound driver).
    */
  def writePartitioned(df: DataFrame, path: String, col: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .partitionBy(col)
      .save(path)
}
