package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{AdvancedQueries, CdcQueries, CoreQueries, DedupQueries, EventsQueries, GraphQueries, Layout, LinkageQueries, MultimodalQueries, PipelineQueries, QualityQueries, SamplingQueries, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's named query; each key
  * with an entry in `oracleSql` is hash-compared against DuckDB at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ CdcQueries.queries ++ EventsQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ MultimodalQueries.queries ++
      AdvancedQueries.queries ++ SamplingQueries.queries ++ GraphQueries.queries ++ QualityQueries.queries ++ PipelineQueries.queries ++ LinkageQueries.queries ++ Layout.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ CdcQueries.oracles ++ EventsQueries.oracles ++
      TextQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ MultimodalQueries.oracles ++
      AdvancedQueries.oracles ++ SamplingQueries.oracles ++ GraphQueries.oracles ++ QualityQueries.oracles ++ PipelineQueries.oracles ++ LinkageQueries.oracles ++ Layout.oracles
}
