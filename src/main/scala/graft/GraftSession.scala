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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val s = builder(appName).master(s"local[$cores]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Load one of the driver tables from a scale-factor dir. The read is a
    * plain parquet scan so Catalyst pushes filters/projection into it.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
