package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the product-quantization mechanics (no SQL oracle exists for a
  * learned codebook):
  *
  *   1. codebook-exact corpus ⇒ ADC ranking equals the exact ranking —
  *      with ≤ Ksub distinct subvectors per subspace the codebooks
  *      reproduce every corpus point exactly, so the approximation error
  *      is provably zero and any ranking difference is a bug in the
  *      encode / LUT / ADC plumbing;
  *   2. neighborhood preservation on clustered data (same fixture
  *      philosophy as `KMeansSpec`): every ADC top-3 neighbor comes from
  *      the query's planted cluster. Exact-id recall is deliberately NOT
  *      asserted there — PQ quantizes away within-cluster jitter by
  *      design, so id-level ranking inside a tight cluster is
  *      resolution-limited; what the index must preserve is the
  *      neighborhood.
  */
class PqSpec extends SparkSpec {

  private val dim = 16

  /** throwaway artifact root — Pq.index now persists trained codebooks */
  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft-pqspec").toString

  /** 16 vectors, each a distinct level-pattern — with exactly Ksub=16
    * points, the seeded k-means init IS the corpus and every point is its
    * own centroid: quantization is lossless by construction.
    */
  private def exactCorpus: DataFrame = {
    import spark.implicits._
    spark.range(0, 16).toDF("id")
      .withColumn("v", expr(
        s"""transform(sequence(0, ${dim - 1}), d ->
           |  cast((id * 7 + d * 3) % 13 as double) + id * 0.5D)""".stripMargin))
      .select($"id".as("vec_id"), $"v")
  }

  private def clustered: DataFrame = {
    import spark.implicits._
    spark.range(0, 200).toDF("id")
      .withColumn("g", (col("id") % 4).cast("int"))
      .withColumn("v", expr(
        s"""transform(sequence(0, ${dim - 1}), d ->
           |  CASE WHEN d div 4 = g THEN 10.0D ELSE 0.0D END
           |  + (((id * 31 + d) % 7) - 3) * 0.1D)""".stripMargin))
      .select($"id".as("vec_id"), $"v")
  }

  private def topK(scored: DataFrame, rankCol: String, k: Int): Set[(Long, Long)] = {
    import spark.implicits._
    val w = Window.partitionBy($"query_id")
      .orderBy(col(rankCol).asc, $"vec_id".asc)
    scored.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** Exact squared-L2 ranking surrogate (same dropped ||q||² convention as
    * the ADC LUT): ||x||² − 2·q·x.
    */
  private def exactScored(corpus: DataFrame, queryPred: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val q = corpus.filter(queryPred)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    corpus.join(broadcast(q), $"vec_id" =!= $"query_id")
      .withColumn("d",
        call_function("graft_dot", $"v", $"v") -
          lit(2.0) * call_function("graft_dot", $"qv", $"v"))
  }

  test("ADC ranking is exact when the corpus is codebook-representable") {
    import spark.implicits._
    val corpus = exactCorpus
    val pred = $"vec_id" % 5 === 0
    val (codes, luts) =
      SimilarityQueries.Pq.index(corpus, root, "spec:exact", pred)
    val adc = codes.join(broadcast(luts), $"vec_id" =!= $"query_id")
      .withColumn("adist", SimilarityQueries.Pq.adcExpr)
    assert(topK(adc, "adist", 3) === topK(exactScored(corpus, pred), "d", 3))
  }

  test("ADC top-3 neighbors stay inside the query's planted cluster") {
    import spark.implicits._
    val corpus = clustered
    val pred = $"vec_id" % 20 === 0
    val (codes, luts) =
      SimilarityQueries.Pq.index(corpus, root, "spec:clustered", pred)
    val adc = codes.join(broadcast(luts), $"vec_id" =!= $"query_id")
      .withColumn("adist", SimilarityQueries.Pq.adcExpr)
    val pq = topK(adc, "adist", 3)
    assert(pq.size === 30, s"10 queries × 3 neighbors, got ${pq.size}")
    // planted cluster = id % 4; 10-vs-0 block separation dwarfs the
    // quantization error, so a cross-cluster neighbor is a plumbing bug
    pq.foreach { case (q, n) =>
      assert(q % 4 === n % 4, s"neighbor $n not in query $q's cluster")
    }
  }

  test("q_knn_pq runs end-to-end: queries × 5 rows, ranks dense") {
    val out = SimilarityQueries.qKnnPq(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty && out.length % 5 === 0)
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getLong(2)).sorted.toSeq === (1L to 5L))
    }
  }

  test("q_knn_ivfpq composes cluster pruning with ADC: dense ranks per query") {
    val out = SimilarityQueries.qKnnIvfPq(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val ranks = rows.map(_.getLong(2)).sorted.toSeq
      assert(ranks === (1L to ranks.length) && ranks.length <= 5,
        s"ranks must be dense from 1: $ranks")
    }
  }

  test("two-stage rerank: exact-cosine order, dense ranks, shortlist-bounded") {
    val out = SimilarityQueries
      .qKnnIvfPqRerank(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val ranks = rows.map(_.getLong(2)).sorted.toSeq
      assert(ranks === (1L to ranks.length) && ranks.length <= 5,
        s"ranks must be dense from 1: $ranks")
      // re-ranked output is ordered by EXACT cosine (desc), not adist
      val byRank = rows.sortBy(_.getLong(2)).map(_.getDouble(3)).toSeq
      assert(byRank === byRank.sorted.reverse,
        s"rerank must order by exact cosine: $byRank")
    }
  }

  /** Subspace twin of KMeansSpec's tie-margin pin: the exact PQ oracles
    * replay the joint Lloyd loop and assume ~1e-15 float-sum drift can
    * never flip a per-subspace argmin, at any replayed iteration. Pinned
    * here on the driver corpus at the gate SF with a wide margin.
    */
  test("PQ oracle tie margins: no subspace assignment near flipping (sf0.01)") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val all = graft.GraftSession.table(spark, "/root/testdata/sf0.01", "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val m = SimilarityQueries.Pq.M
    (0 to 2).foreach { it =>
      val books = SimilarityQueries.Pq.fitAll(all, iters = it)
      val nrm = books.map(_.map(c => c.map(x => x * x).sum))
      val dsub = books(0)(0).length
      val sub = all.select(explode(array((0 until m).map(j =>
        struct(lit(j).as("j"), slice($"v", j * dsub + 1, dsub).as("sv"))): _*))
        .as("e")).select($"e.j".as("j"), $"e.sv".as("sv"))
      val minGap = sub
        .withColumn("cl", element_at(
          typedlit(books.map(_.map(_.toSeq).toSeq).toSeq), $"j" + 1))
        .withColumn("nl", element_at(
          typedlit(nrm.map(_.toSeq).toSeq), $"j" + 1))
        .withColumn("ds", array_sort(expr(
          "zip_with(nl, cl, (n, c) -> n - 2 *" +
            " aggregate(zip_with(sv, c, (x, y) -> x * y), 0D, (a, x) -> a + x))")))
        .select(min(element_at($"ds", 2) - element_at($"ds", 1)).as("g"))
        .collect().head.getDouble(0)
      assert(minGap > 1e-6,
        s"iteration $it: subspace argmin gap $minGap is within float-drift " +
          "range — the exact PQ oracle is no longer safe")
    }
  }
}
