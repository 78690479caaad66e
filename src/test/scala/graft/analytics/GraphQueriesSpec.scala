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
}
