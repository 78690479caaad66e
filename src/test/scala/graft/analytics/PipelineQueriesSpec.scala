package graft.analytics

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Properties of the dataset-assembly operators that the DuckDB oracle
  * can't express: balance quality of the shard dealer, split-ratio
  * envelopes, and the plan shape of the contamination probe.
  */
class PipelineQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("shard dealer balances docs and bytes across shards") {
    val shards = PipelineQueries.qShardBalance(spark, dir).collect()
    assert(shards.length === 8)
    val counts = shards.map(_.getAs[Long]("n_docs"))
    // round-robin deal: doc counts differ by at most 1
    assert(counts.max - counts.min <= 1, counts.toSeq)
    // LPT-style balance: byte totals within one max-doc of each other
    val sums = shards.map(_.getAs[Long]("sum_chars"))
    val maxDoc = shards.map(_.getAs[Long]("max_chars")).max
    assert(sums.max - sums.min <= maxDoc, (sums.toSeq, maxDoc))
  }

  test("split assignment is total, disjoint and near the 90/5/5 target") {
    val agg = PipelineQueries.qSplitAssign(spark, dir)
      .groupBy(col("split")).agg(sum(col("n_docs")).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    val total = agg.values.sum
    val nDocs = graft.GraftSession.table(spark, dir, "documents").count()
    assert(total === nDocs) // every doc lands in exactly one split
    // binomial envelope: 500 docs, p=0.898 -> sigma ~ 6.8; allow 5 sigma
    assert(math.abs(agg("train") - 0.898 * total) < 0.15 * total, agg)
    assert(agg.getOrElse("val", 0L) + agg.getOrElse("test", 0L) ===
      total - agg("train"))
  }

  test("split assignment is reproducible run to run") {
    val a = PipelineQueries.qSplitAssign(spark, dir).collect().toSet
    val b = PipelineQueries.qSplitAssign(spark, dir).collect().toSet
    assert(a === b)
  }

  test("contamination probe broadcasts the eval side (no corpus shuffle join)") {
    val df = PipelineQueries.qTextContamination(spark, dir)
    df.count()
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the train-shingle stream must not sort-merge against the eval set
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("entropy is log2(alphabet) for uniform text and 0 for constant text") {
    import spark.implicits._
    val out = PipelineQueries.entropyOf(
      Seq((1L, "abcd"), (2L, "aaaa")).toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy")).toMap
    assert(math.abs(out(1L) - 2.0) < 1e-12) // 4 distinct chars -> 2 bits
    assert(math.abs(out(2L)) < 1e-12)
  }
}
