package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means for IVF-style ANN indexing.
  *
  * Scale shape: centroids are driver-held (k × dim doubles — a few KB at
  * any realistic k/dim, e.g. 4096×1024 ≈ 32 MB worst case rides as a plan
  * literal / broadcast), while every data-touching step is distributed:
  * assignment is a codegen'd argmin over centroid literals (one narrow map
  * over the corpus), re-centering is posexplode → groupBy(cluster, pos) —
  * two small shuffles per iteration. Each iteration is ONE Spark job;
  * training is an explicit index-BUILD action (like writing a parquet
  * index), not plan-construction metadata — at 100 TB you run `fit` once,
  * persist the centroids, and share them across every search query.
  *
  * Reproducible by construction: init = the k lowest-id vectors, fixed
  * iteration count, assignment ties broken by cluster id. Centroids are
  * reproducible up to floating-point REDUCTION ORDER: `sum(x)` merges
  * partial double sums in shuffle-completion order, so repeated fits can
  * differ in the last ulps (and a near-equidistant point could flip
  * assignment). For a training-data index that is the right trade — the
  * alternative (sorted deterministic folds) buffers every member value
  * per (cluster, dim). Persist the trained centroids if downstream
  * consumers need bit-stable assignments.
  */
object KMeans {

  /** argmin over k centroids of ||v − c||² (the ||v||² term is constant
    * per row and dropped): `array_min` over (distance-term, cluster-id)
    * structs gives a codegen'd lexicographic argmin with deterministic
    * tie-break by id. `graft_dot` keeps the inner product a primitive
    * loop inside whole-stage codegen.
    */
  def assignExpr(v: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cc = c.map(x => x * x).sum // ||c||², plan-time constant
      struct(
        (lit(cc) - lit(2.0) * call_function("graft_dot", v, typedlit(c.toSeq)))
          .as("d"),
        lit(i).as("c"))
    }
    array_min(array(scored.toIndexedSeq: _*)).getField("c")
  }

  /** The `nprobe` nearest centroid ids for a query vector, as an array
    * column (ascending by distance, ties by id).
    */
  def probeExpr(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cc = c.map(x => x * x).sum
      struct(
        (lit(cc) - lit(2.0) * call_function("graft_dot", v, typedlit(c.toSeq)))
          .as("d"),
        lit(i).as("c"))
    }
    transform(slice(sort_array(array(scored.toIndexedSeq: _*)), 1, nprobe),
      s => s.getField("c"))
  }

  /** Lloyd's iterations. `vecs` must expose an id column (ordering seeds
    * the deterministic init) and an `array<double>` vector column. Empty
    * clusters keep their previous centroid.
    */
  def fit(vecs: DataFrame, idCol: String, vCol: String,
      k: Int, iters: Int): Array[Array[Double]] = {
    graft.functions.VectorFunctions.register(vecs.sparkSession)
    val v = vecs.select(col(idCol).as("id"), col(vCol).as("v"))
    var cents: Array[Array[Double]] = v.orderBy(col("id")).limit(k).collect()
      .map(_.getSeq[Double](1).toArray)
    require(cents.length == k, s"need ≥ $k vectors to seed $k centroids")
    val dim = cents.head.length
    (0 until iters).foreach { _ =>
      val sums = v
        .withColumn("c", assignExpr(col("v"), cents))
        .select(col("c"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("c"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val acc = Array.fill(k, dim)(0.0)
      val n = Array.fill(k)(0L)
      sums.foreach { r =>
        val c = r.getInt(0); val pos = r.getInt(1)
        acc(c)(pos) = r.getDouble(2); n(c) = r.getLong(3)
      }
      cents = Array.tabulate(k)(c =>
        if (n(c) == 0L) cents(c) else acc(c).map(_ / n(c)))
    }
    cents
  }
}
