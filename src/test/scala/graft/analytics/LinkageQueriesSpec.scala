package graft.analytics

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics + plan-shape pins for the linkage / span-dedup / semantic-dedup
  * operators (oracle coverage exists for the first two; the plan shape and
  * the SemDeDup semantics are what only a spec can pin).
  */
class LinkageQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("fuzzy join blocks on the last word — no quadratic join in the plan") {
    val df = LinkageQueries.qFuzzyJoin(spark, sf)
    val rows = df.collect()
    // executed plan AFTER the action: under AQE the pre-execution
    // executedPlan is a single AdaptiveSparkPlan leaf whose children are
    // invisible to tree traversal — explainString on the finalized plan
    // is the only honest view (same technique as PlanAssertionsSpec,
    // which also pins this query suite-wide)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must stay an equi-join on the block key:\n$plan")
    // verify semantics on the real fixture: every matched pair shares the
    // block word and is within the distance bound, ordered a < b
    rows.foreach { r =>
      val (a, b, d) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a < b && d <= 4L)
      assert(a.split(' ').last == b.split(' ').last)
    }
    assert(rows.nonEmpty, "fixture part names must produce matches")
  }

  test("span dedup: planted verbatim 8-gram run is flagged in both docs, unique text is not") {
    import spark.implicits._
    val run = (1 to 8).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $run gamma delta epsilon zeta eta theta iota"),
      (2L, s"one two three $run four five six seven eight nine"),
      (3L, "a completely different sentence with no shared run of words at all here")
    ).toDF("doc_id", "text")
    val out = LinkageQueries.spanStats(docs)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_spans", "n_dup_spans", "dup_frac"))
    val byDoc = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 10-word fillers around the 8-token run: each doc has its own unique
    // spans plus EXACTLY ONE span equal to the planted run
    assert(byDoc(1L)._2 === 1L, "doc 1 shares exactly the planted span")
    assert(byDoc(2L)._2 === 1L, "doc 2 shares exactly the planted span")
    assert(byDoc(3L)._2 === 0L, "unique doc has no duplicated spans")
    assert(byDoc(3L)._1 === 6L, "13-word doc yields 6 distinct 8-gram spans")
  }

  test("semantic prune: planted same-cluster duplicate is pruned, keeper is the min id") {
    import spark.implicits._
    // cluster 0: ids 10/11 nearly identical (cos ~1), id 12 orthogonal;
    // cluster 1: two orthogonal vectors — nothing pruned
    val rows = Seq(
      (0, 10L, Seq(1.0, 0.0, 0.0, 0.0)),
      (0, 11L, Seq(0.999, 0.04, 0.0, 0.0)),
      (0, 12L, Seq(0.0, 1.0, 0.0, 0.0)),
      (1, 20L, Seq(0.0, 0.0, 1.0, 0.0)),
      (1, 21L, Seq(0.0, 0.0, 0.0, 1.0))
    ).toDF("cluster", "vec_id", "v")
      .withColumn("nrm", sqrt(expr("aggregate(v, 0.0d, (a, x) -> a + x * x)")))
    graft.functions.VectorFunctions.register(spark)
    val out = LinkageQueries.semanticPrune(rows, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) === ((3L, 1L, 1L)), "cluster 0: one near pair, id 11 pruned")
    assert(out(1L) === ((2L, 0L, 0L)), "cluster 1: nothing near")
  }

  test("q_dedup_semantic runs end-to-end with deterministic per-cluster rows") {
    val out = LinkageQueries.qDedupSemantic(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 8)
    val total = out.map(_.getLong(1)).sum
    val corpus = graft.GraftSession.table(spark, sf, "embeddings").count()
    assert(total === corpus, "cluster sizes must partition the corpus")
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), "pruned ≤ cluster size")
    }
  }
}
