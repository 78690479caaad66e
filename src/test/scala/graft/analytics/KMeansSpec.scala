package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the IVF-k-means mechanics on data where an ANN index is
  * meaningful: 4 well-separated synthetic clusters (deterministic jitter).
  * The driver's `embeddings` table is measured isotropic noise — recall vs
  * brute is inherently low there for ANY index — so the ≥ 0.9 recall
  * contract is asserted here, on clustered data, where it is a property of
  * the INDEX rather than of luck.
  */
class KMeansSpec extends SparkSpec {

  private val k = 4
  private val dim = 16

  /** 200 vectors in 4 clusters: cluster g centers at 10·one-hot-block(g),
    * deterministic per-(id, dim) jitter in [-0.3, 0.3].
    */
  private def clustered: DataFrame = {
    import spark.implicits._
    spark.range(0, 200).toDF("id")
      .withColumn("g", (col("id") % k).cast("int"))
      .withColumn("v", expr(
        s"""transform(sequence(0, ${dim - 1}), d ->
           |  CASE WHEN d div 4 = g THEN 10.0D ELSE 0.0D END
           |  + (((id * 31 + d) % 7) - 3) * 0.1D)""".stripMargin))
  }

  test("Lloyd training recovers the planted clusters (deterministic)") {
    val df = clustered
    val cents = KMeans.fit(df, "id", "v", k, iters = 3)
    assert(cents.length == k && cents.forall(_.length == dim))
    // assignment purity: every learned cluster contains exactly one g
    val purity = df
      .withColumn("c", KMeans.assignExpr(col("v"), cents))
      .groupBy("c").agg(countDistinct("g").as("ng"), count(lit(1)).as("n"))
      .collect()
    assert(purity.length == k, purity.mkString(","))
    assert(purity.forall(_.getLong(1) == 1L), purity.mkString(","))
    // reproducibility: a second fit agrees up to floating-point reduction
    // order (partial double sums merge in shuffle-completion order, so
    // exact bit equality is NOT guaranteed — see KMeans scaladoc)
    val cents2 = KMeans.fit(df, "id", "v", k, iters = 3)
    cents.zip(cents2).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("IVF search recall vs brute ≥ 0.9 on clustered data") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val df = clustered
      .withColumn("nrm", sqrt(call_function("graft_dot", col("v"), col("v"))))
    val cents = KMeans.fit(df, "id", "v", k, iters = 3)
    val corpus = df.withColumn("cluster", KMeans.assignExpr(col("v"), cents))
    val queries = df.filter($"id" % 20 === 0)
      .select($"id".as("qid"), $"v".as("qv"), $"nrm".as("qn"))

    def top3(scored: DataFrame): Set[(Long, Long)] = {
      val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"id".asc)
      scored.withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
        .select($"qid", $"id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val cos = call_function("graft_dot", $"qv", $"v") / ($"qn" * $"nrm")
    val brute = top3(corpus.join(broadcast(queries), $"id" =!= $"qid")
      .withColumn("cos", cos))
    // nprobe=1: on separated clusters the nearest list holds the neighbors
    val probed = broadcast(queries
      .withColumn("cluster",
        explode(KMeans.probeExpr($"qv", cents, nprobe = 1))))
    val ivf = top3(corpus.join(probed, Seq("cluster"))
      .filter($"id" =!= $"qid").withColumn("cos", cos))

    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall; brute=${brute.size} ivf=${ivf.size}")
  }

  /** The learned-index DuckDB oracles replay the deterministic Lloyd loop
    * and assume distributed float-sum order (~1e-15 relative drift in the
    * per-cluster means) can never flip an argmin. That holds only if no
    * corpus vector is ever NEAR-EQUIDISTANT between its best and
    * second-best centroid — at ANY iteration of the replayed training,
    * not just the last. This pins the assumption on the actual driver
    * corpus at the gate SF: the minimum best-to-second-best distance gap
    * stays ≥ 9 orders of magnitude above the drift, so a near-tie in
    * future fixture data fails HERE with a number, not as a flaky
    * hash_match in the driver gate.
    */
  test("oracle tie margins: no assignment within float-drift range of flipping (sf0.01)") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val dir = "/root/testdata/sf0.01"
    val all = graft.GraftSession.table(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    // centroid sets ENTERING each of the 3 replayed iterations: the set
    // entering iteration i+1 is fit's output after i iterations (iters=0
    // returns the seed — deterministic by construction)
    (0 to 2).foreach { it =>
      val cents = KMeans.fit(all, "vec_id", "v", k = 8, iters = it)
      val nrm = cents.map(c => c.map(x => x * x).sum)
      val minGap = all
        .withColumn("cl", typedlit(cents.map(_.toSeq).toSeq))
        .withColumn("nl", typedlit(nrm.toSeq))
        .withColumn("ds", array_sort(expr(
          "zip_with(nl, cl, (n, c) -> n - 2 *" +
            " aggregate(zip_with(v, c, (x, y) -> x * y), 0D, (a, x) -> a + x))")))
        .select(min(element_at($"ds", 2) - element_at($"ds", 1)).as("g"))
        .collect().head.getDouble(0)
      assert(minGap > 1e-6,
        s"iteration $it: best-to-second-best centroid gap $minGap is within " +
          "float-drift range — the exact k-means oracle is no longer safe")
    }
  }
}
