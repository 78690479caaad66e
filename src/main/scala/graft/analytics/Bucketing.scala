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
}
