package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.{SparkEntry, SparkSpec}

/** Physical-plan shape assertions — the scale contract, not just the
  * row-level results: filters must reach the parquet scan, dimension
  * joins must broadcast, aggregations must have a map-side partial phase,
  * and global top-k must not global-sort. A plan that silently regresses
  * on any of these still passes value-level tests at sf0.01 but falls
  * over at 100 TB, so they are pinned here.
  */
class PlanAssertionsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Execute (forces AQE to finalize) and return the formatted plan. */
  private def planOf(df: DataFrame): String = {
    df.count()
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  private def run(name: String): String =
    planOf(SparkEntry.queries(name)(spark, dir))

  test("filter + projection push into the parquet scan (q2_filter_pushdown)") {
    val plan = run("q2_filter_pushdown")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(!plan.contains("PushedFilters: []"), plan)
    // column pruning: the lineitem scan must not read all 16 columns
    assert(plan.contains("ReadSchema"), plan)
  }

  test("dimension joins broadcast (q5_local_supplier)") {
    val plan = run("q5_local_supplier")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("aggregation has a map-side partial phase (q1_pricing_summary)") {
    val plan = run("q1_pricing_summary")
    assert(plan.contains("partial_"), plan)
  }

  test("z-order layout face is windowless: bucket is map-side arithmetic " +
      "into a partial hash aggregate, no single-task sort") {
    val plan = run("q_zorder_layout")
    // the r11 face used ntile(64) OVER (ORDER BY zval …): a GLOBAL window
    // — every row through ONE task's sort, the plan that dies at 100 TB
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_"), plan)
  }

  test("global top-k avoids a global sort (q_sort_limit)") {
    val plan = run("q_sort_limit")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("minhash aggregate is object-hash with partial merge") {
    // since the chain tables became durable artifacts (round 16), the
    // CONSUMER plan is a parquet read-back; the aggregate contract lives
    // on the BUILD plan chainTable materializes
    val plan = planOf(DedupQueries.mh128Build(spark, dir))
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_minhash128"), plan)
  }

  test("LSH verify joins: hash build only for the narrow pair list, wide join is sort-merge") {
    // the second verify join carries the per-doc hash SETS on the pair
    // rows — building a HashedRelation over those wide rows is a multi-GB
    // allocation spike (measured: 3.3 s young GCs, q_dedup_ngram_jaccard
    // at 108 s before the fix). The shape contract: at most one
    // ShuffledHashJoin (candidate-list build) and at least one
    // SortMergeJoin (the set-carrying join streams).
    // the BUILD plan (see the minhash test above): consumers of
    // q_dedup_ngram_jaccard now read the pairs32x4_070 artifact back.
    // collect(), not count(): the frame's OWN AQE plan must finalize
    // for the Final-tree assertion (same note as the salted-join test)
    val df = DedupQueries.pairsBuild(spark, dir,
      bands = 32, rowsPerBand = 4, 0.7)
    df.collect()
    val plan = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // AQE prints the tree twice (final + initial) plus a details section;
    // assert on the FINAL tree only
    val finalTree = plan.substring(
      plan.indexOf("== Final Plan =="),
      plan.indexOf("== Initial Plan =="))
    assert(finalTree.contains("SortMergeJoin"), plan)
    val shjCount = "ShuffledHashJoin".r.findAllIn(finalTree).length
    assert(shjCount <= 1, s"wide verify join regressed to hash build:\n$plan")
    // …and when the narrow-build join IS shuffle-hash, the build side must
    // be the candidate pair list (BuildRight of a.join(cand)), never the
    // corpus — a flipped build side hashes the whole per-doc set table
    if (shjCount == 1) {
      val shjLine = finalTree.linesIterator
        .find(_.contains("ShuffledHashJoin")).get
      assert(shjLine.contains("BuildRight"),
        s"candidate-list build side flipped:\n$plan")
    }
  }

  test("salted join stays a shuffle join — broadcast would undo the salt") {
    // SkewUtils.saltedJoin exists to spread a hot key across (key, salt)
    // REDUCERS; a broadcast join has no reducers to spread (and funnels
    // the salt-replicated build side through the driver — measured ~9 s
    // on a 750 k-row join at sf0.1). The hint pins shuffle-hash; this
    // spec pins the hint against a Spark upgrade or hint change.
    // collect(), not count(): count() builds a NEW plan on top, and this
    // query's own AQE plan must finalize for the Final-tree assertion
    // (the 5-row rollup is trivially collectable)
    val df = SparkEntry.queries("q_salted_join")(spark, dir)
    df.collect()
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val finalTree = plan.substring(
      plan.indexOf("== Final Plan =="),
      plan.indexOf("== Initial Plan =="))
    assert(finalTree.contains("ShuffledHashJoin"),
      s"salted join lost its shuffle-hash pin:\n$plan")
    assert(!finalTree.contains("BroadcastHashJoin"),
      s"salted join regressed to broadcast:\n$plan")
  }

  test("semi/anti joins stay joins, not subquery re-execution") {
    val semi = run("q_exists_semi")
    assert(semi.contains("LeftSemi"), semi)
    val anti = run("q_not_exists_anti")
    assert(anti.contains("LeftAnti"), anti)
  }

  test("banded dedup/LSH plans contain no quadratic join operator") {
    // the 100 TB contract of the whole dedup suite: candidates come from
    // equi-joins on band buckets, never from an all-pairs expansion. A
    // regression to BroadcastNestedLoopJoin (or worse, an interpreted
    // CartesianProduct) would still pass value checks at sf0.01.
    // (q_knn_pq is deliberately absent: ADC is a compressed-domain brute
    // scan — the broadcast-query NLJ is its intended shape, like
    // q_knn_brute; candidate pruning is IVF's job, not PQ's)
    Seq("q_dedup_simhash", "q_dedup_simhash64", "q_dedup_minhash_lsh",
        "q_dedup_ngram_jaccard", "q_dedup_minhash256",
        "q_dedup_embedding_lsh", "q_dedup_embedding_lsh64",
        "q_dedup_embedding_incremental",
        "q_dedup_incremental", "q_dedup_containment",
        "q_dedup_containment_incremental", "q_knn_ivf_kmeans",
        "q_knn_ivfpq", "q_knn_ivfpq_res", "q_knn_ivfpq_rerank",
        "q_range_join", "q_fuzzy_join", "q_dedup_semantic").foreach { q =>
      val plan = run(q)
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q:\n$plan")
    }
  }

  test("span dedup: count join-back, no quadratic join, no per-unit lists") {
    // the suffix-array stand-in must never SELF-join the span table on
    // anything but the unit key, and must never materialize a per-unit
    // doc-id list (a universal boilerplate span would make that one
    // corpus-sized buffer in one task). The shape is: per-unit COUNT,
    // equi-joined back onto the (doc_id, unit) rows.
    val plan = run("q_dedup_spans")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("collect_list"), plan)
  }

  test("exact embedding baseline keeps the codegen'd BNLJ, not Cartesian") {
    // qDedupEmbedding is all-pairs BY DESIGN (threshold at the measured
    // noise floor — see its scaladoc); the guard here is against silently
    // degrading from the codegen'd broadcast NLJ to an interpreted
    // CartesianProduct (measured 18× slower on this query shape).
    val plan = run("q_dedup_embedding")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("exact embedding baseline REFUSES to start past the row-count gate") {
    // the quadratic baseline must fail fast (metadata-only footer count)
    // when pointed at a corpus-sized table, with a pointer to the banded
    // scale path — not OOM an executor mid-broadcast
    val prev = sys.props.put("graft.dedup.exact.maxRows", "10")
    try {
      val e = intercept[IllegalArgumentException] {
        DedupQueries.qDedupEmbedding(spark, "/root/testdata/sf0.001")
      }
      assert(e.getMessage.contains("q_dedup_embedding_lsh"), e.getMessage)
    } finally prev match {
      case Some(v) => sys.props.put("graft.dedup.exact.maxRows", v)
      case None => sys.props.remove("graft.dedup.exact.maxRows")
    }
  }

  test("session stats is a single pass — no join back to the events scan") {
    val plan = run("q_events_session_stats")
    assert(!plan.contains("Join"), plan)
  }

  test("CMS probe reaches the heavy-hitters scan before the vocabulary shuffle") {
    val plan = run("q_text_heavy_hitters")
    assert(plan.contains("graft_cms_min"), plan)
    // the exact verification aggregation must still exist (partial+final)
    assert(plan.contains("partial_"), plan)
  }

  test("rank-filter queries get the built-in WindowGroupLimit pushdown") {
    // grouped top-k (filter on row_number <= k) must prune per-partition
    // BEFORE the key shuffle via Spark's Partial WindowGroupLimit — the
    // shuffle then carries at most k rows per (key, input-partition)
    // instead of every row. This is why no custom top-k operator exists
    // in this engine: the built-in already does the two-phase pushdown.
    val plan = run("q_sample_topk")
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("Partial"), plan)
  }

  test("pagerank iterations read the cached graph, not the fact join") {
    val plan = run("q_graph_pagerank")
    // edges/nodes persist: the 10-iteration subtree must scan the cache
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"), plan)
  }

  test("bloom probe prunes the fact scan before the join exchange") {
    val plan = run("q_bloom_join")
    // the codegen'd probe must be IN the plan (not optimized away) and the
    // real equi-join must still run (exactness comes from the join, the
    // bloom only reduces its input)
    assert(plan.contains("graft_bloom_contains"), plan)
    assert(plan.contains("HashJoin"), plan)
    // the probe filter must sit BELOW the join: the formatted plan prints
    // operators in pre-order (parents before children), so the filter's
    // node must appear AFTER the join header that consumes it
    val filterIdx = plan.indexOf("graft_bloom_contains")
    val joinIdx = plan.indexOf("HashJoin")
    assert(filterIdx > joinIdx, plan)
  }
}
