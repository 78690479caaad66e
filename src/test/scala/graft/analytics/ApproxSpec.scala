package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Error envelopes for the approximate operators (no DuckDB oracle —
  * approximation is engine-specific, so the bound IS the contract).
  */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx_percentile at accuracy 1000 (the production config) stays " +
      "within the rank-error bound vs exact") {
    val approx = AdvancedQueries.approxPercentile(spark, dir, accuracy = 1000)
      .select(col("l_returnflag"),
        posexplode(array(col("p50"), col("p90"), col("p99"))))
      .withColumnRenamed("col", "apx")
    val exact = graft.GraftSession.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.49, 0.51))").as("p50"),
        expr("percentile(l_extendedprice, array(0.89, 0.91))").as("p90"),
        expr("percentile(l_extendedprice, array(0.98, 1.0))").as("p99"))
    // accuracy 1000 ⇒ rank error ≤ 0.001; checking against ±0.01-rank
    // exact envelopes is 10× looser — a real regression still fails
    val j = approx.join(exact, "l_returnflag")
    val bad = j.filter(
      (col("pos") === 0 && (col("apx") < element_at(col("p50"), 1) ||
        col("apx") > element_at(col("p50"), 2))) ||
      (col("pos") === 1 && (col("apx") < element_at(col("p90"), 1) ||
        col("apx") > element_at(col("p90"), 2))) ||
      (col("pos") === 2 && (col("apx") < element_at(col("p99"), 1) ||
        col("apx") > element_at(col("p99"), 2))))
    assert(bad.count() === 0)
  }

  test("q_approx_percentile (accuracy > N) is EXACT: the element at rank " +
      "ceil(p*n) — the oracled contract") {
    import org.apache.spark.sql.expressions.Window
    val exact = graft.GraftSession.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        row_number().over(Window.partitionBy("l_returnflag")
          .orderBy("l_extendedprice")).as("rk"),
        count(lit(1)).over(Window.partitionBy("l_returnflag")).as("n"))
      .groupBy(col("l_returnflag"))
      .agg(
        max(when(col("rk") === ceil(col("n") * 0.5), col("l_extendedprice")))
          .as("x50"),
        max(when(col("rk") === ceil(col("n") * 0.9), col("l_extendedprice")))
          .as("x90"),
        max(when(col("rk") === ceil(col("n") * 0.99), col("l_extendedprice")))
          .as("x99"))
    val j = AdvancedQueries.qApproxPercentile(spark, dir)
      .join(exact, "l_returnflag")
    val bad = j.filter(col("p50") =!= col("x50") ||
      col("p90") =!= col("x90") || col("p99") =!= col("x99"))
    assert(bad.count() === 0, "GK with accuracy > N must be rank-exact")
  }

  test("approx_count_distinct (HLL) stays within its relative-error envelope") {
    // HLL is no longer the q_approx_distinct surface (that query is now
    // KMV-exact and DuckDB-oracled) but remains the fixed-memory operator
    // for when even k·8 B sparse sketches are too much — pinned here
    // directly against exact counts
    val approx = graft.GraftSession.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
    val exact = graft.GraftSession.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("x_parts"),
        countDistinct(col("l_orderkey")).as("x_orders"))
    val j = approx.join(exact, "l_returnflag")
    // rsd 0.02 requested; 5 sigma envelope
    val bad = j.filter(
      abs(col("approx_parts") - col("x_parts")) > col("x_parts") * 0.1 ||
      abs(col("approx_orders") - col("x_orders")) > col("x_orders") * 0.1)
    assert(bad.count() === 0)
  }

  test("q_approx_distinct is EXACT in sparse mode (the oracled contract)") {
    val approx = AdvancedQueries.qApproxDistinct(spark, dir)
    val exact = graft.GraftSession.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).cast("double").as("x_parts"),
        countDistinct(col("l_orderkey")).cast("double").as("x_orders"))
    val j = approx.join(exact, "l_returnflag")
    val bad = j.filter(col("approx_parts") =!= col("x_parts") ||
      col("approx_orders") =!= col("x_orders"))
    assert(bad.count() === 0, "sparse-mode KMV estimates must equal exact")
  }
}
