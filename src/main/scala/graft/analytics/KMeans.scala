package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means for IVF-style ANN indexing.
  *
  * Scale shape: centroids are driver-held (k × dim doubles — a few KB at
  * any realistic k/dim, e.g. 4096×1024 ≈ 32 MB worst case rides as a plan
  * literal / broadcast), while every data-touching step is distributed:
  * assignment is a codegen'd argmin kernel over a literal centroid matrix
  * ([[graft.functions.CodebookArgmin]] — the matrix lives in the codegen
  * `references` array, so the generated source is IDENTICAL across
  * iterations and queries and the codegen cache hits instead of
  * re-compiling a fresh literal-laden class per iteration), re-centering is
  * posexplode → groupBy(cluster, pos) — two small shuffles per iteration.
  * Each iteration is ONE Spark job; training is an explicit index-BUILD
  * action (like writing a parquet index), not plan-construction metadata —
  * at 100 TB you run `fit` once, persist the centroids, and share them
  * across every search query. [[fitMemo]] does exactly that for a session:
  * one training pass per (key, k, iters), every consumer reuses it.
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
    * per row and dropped): one codegen'd primitive loop
    * ([[graft.functions.CodebookArgmin]]) with deterministic tie-break by
    * centroid id; the matrix is a single foldable literal child.
    */
  def assignExpr(v: Column, centroids: Array[Array[Double]]): Column =
    call_function("graft_argmin_dot", lit(0), v,
      typedlit(Seq(centroids.map(_.toSeq).toSeq)))

  /** The `nprobe` nearest centroid ids for a query vector, as an array
    * column (ascending by distance, ties by id).
    */
  def probeExpr(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    call_function("graft_probe_dot", v,
      typedlit(centroids.map(_.toSeq).toSeq), lit(nprobe))

  /** Session-scoped trained-centroid store: `fit` is the index-BUILD step,
    * and a real deployment trains ONCE and shares the artifact across every
    * search query — re-training per query would duplicate driver actions
    * (measured: q_knn_ivfpq re-ran the full fit q_knn_ivf_kmeans had just
    * done). Keyed by caller-supplied corpus key + hyperparameters.
    */
  private val trained =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  /** Number of full training runs this JVM has executed — observability
    * for the train-once contract: specs assert a second consumer (memo
    * hit) and a fresh session over a persisted artifact (load hit) leave
    * this counter unchanged.
    */
  val fitRuns = new java.util.concurrent.atomic.AtomicLong(0)

  /** Drop every memoized artifact (tests that regenerate fixture data
    * under a reused key, or a deliberate retrain).
    */
  def clearMemo(): Unit = trained.clear()

  /** [[fit]], memoized on (key, k, iters) for the life of the session.
    * Callers whose data can change under a reused key should fold a data
    * fingerprint into `key` ([[AnnIndex.sourceFingerprint]]) — the memo
    * itself never re-reads the data.
    */
  def fitMemo(key: String, vecs: DataFrame, idCol: String, vCol: String,
      k: Int, iters: Int): Array[Array[Double]] =
    trained.computeIfAbsent(s"$key:k=$k:i=$iters",
      _ => fit(vecs, idCol, vCol, k, iters))

  /** The production train-once flow, both halves: in-session memo first,
    * then the persisted parquet artifact ([[AnnIndex]]), then — only if
    * neither exists — an actual training run, whose output is persisted
    * before returning. `key` must embed a data fingerprint
    * ([[AnnIndex.sourceFingerprint]]); it keys the memo AND the artifact
    * path, so stale artifacts are unreachable rather than invalidated.
    * At 100 TB this is the difference between every search session paying
    * an iters-pass corpus scan and paying one millisecond-scale driver
    * read of k·dim doubles.
    */
  def fitPersistent(root: String, key: String, vecs: DataFrame,
      idCol: String, vCol: String, k: Int, iters: Int): Array[Array[Double]] = {
    val spark = vecs.sparkSession
    val memoKey = s"$key:k=$k:i=$iters"
    trained.computeIfAbsent(memoKey, _ => {
      val path = s"$root/${AnnIndex.sanitize(memoKey)}/centroids"
      if (AnnIndex.exists(spark, path)) AnnIndex.loadCentroids(spark, path)
      else {
        val cents = fit(vecs, idCol, vCol, k, iters)
        AnnIndex.saveCentroids(spark, path, cents)
        cents
      }
    })
  }

  /** Lloyd's iterations. `vecs` must expose an id column (ordering seeds
    * the deterministic init) and an `array<double>` vector column. Empty
    * clusters keep their previous centroid.
    */
  def fit(vecs: DataFrame, idCol: String, vCol: String,
      k: Int, iters: Int): Array[Array[Double]] = {
    fitRuns.incrementAndGet()
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
