package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PageRank invariants the value-level oracle doesn't state explicitly:
  * probability-mass conservation and positivity (dangling mass is zero in
  * this graph — every nation ships something).
  */
class GraphQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pagerank is a probability distribution over the node set") {
    val out = GraphQueries.qGraphPagerank(spark, dir).cache()
    val total = out.agg(sum("rank")).first().getDouble(0)
    // no dangling nodes (every src has out-edges by construction of the
    // edge aggregation), so mass is conserved exactly up to fp error
    assert(math.abs(total - 1.0) < 1e-9, s"total=$total")
    assert(out.filter(col("rank") <= 0.0).count() == 0)
    // the node spine is the distinct union of srcs and dsts
    val nodes = out.count()
    assert(nodes > 0 && out.select("node").distinct().count() == nodes)
    out.unpersist()
  }

  test("lineage truncation past the checkpoint-free band is a semantic " +
      "no-op and bounds the unrolled plan's depth") {
    def ranks(truncate: Boolean): Map[Long, Double] =
      GraphQueries.pagerank(spark, dir, iterations = 12,
          truncate = Some(truncate))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plain = ranks(truncate = false)
    val truncated = ranks(truncate = true)
    assert(plain.keySet === truncated.keySet)
    // exact-equality would pin double addition order across two runs;
    // the oracle gate's 1e-9 tolerance is the cross-engine contract, so
    // hold the intra-engine no-op to something far tighter
    plain.foreach { case (node, r) =>
      assert(math.abs(r - truncated(node)) < 1e-12,
        s"truncation changed node $node: $r vs ${truncated(node)}")
    }
    // the truncated 12-iteration frame analyzes as a ~4-iteration tree
    // (last checkpoint at i = 8): its plan text must be well under the
    // untruncated unroll's
    val planOf = (t: Boolean) => GraphQueries.pagerank(spark, dir,
      iterations = 12, truncate = Some(t))
      .queryExecution.analyzed.toString.length
    assert(planOf(true) < planOf(false) / 2,
      s"truncation did not bound the plan: ${planOf(true)} vs " +
        s"${planOf(false)}")
    // and the oracled default stays in the checkpoint-free band: 10
    // iterations produce NO checkpoint boundary (the measured crossover
    // — see GraphQueries.CheckpointFreeIters)
    assert(GraphQueries.CheckpointFreeIters >= 10)
  }
}
