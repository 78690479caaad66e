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
}
