package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession.table

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]` vectors; driver mandate).
  *
  * Scale design:
  *   - `q_knn_brute` is the exact baseline: the (small) query set is
  *     broadcast against the full corpus — at 1000 executors every corpus
  *     partition scores its residents locally, then per-query top-k is a
  *     TakeOrdered-style window, so the shuffle carries only k·P candidate
  *     rows, never the corpus;
  *   - `q_knn_ivf` is the scale path: an inverted-file (IVF) search that
  *     prunes the corpus to the probed partition before scoring. Here the
  *     generator's `label` IS the cluster assignment (deterministic — no
  *     k-means dependency in the oracle); at 100 TB the same plan holds
  *     with learned centroids: join queries to their probe cluster ids and
  *     score only co-partitioned vectors (a fraction 1/nlist of the data);
  *   - cosine is computed in double (`zip_with` + `aggregate` fold — all
  *     codegen'd) so results match the DuckDB oracle bit-for-bit; rank ties
  *     are broken by vec_id so ordering is deterministic.
  */
object SimilarityQueries {

  /** (vec_id, v: array<double>, nrm) projection of `embeddings`. */
  private def vecs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    table(spark, dir, "embeddings")
      .select($"vec_id", $"label",
        transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
  }

  /** codegen'd primitive-loop kernel ([[graft.functions.ArrayDotProduct]]) */
  private val dot = expr("graft_dot(qv, v)")

  /** Exact brute-force cosine top-10 for each query vector
    * (queries = every 50th id — a small broadcast side).
    */
  def qKnnBrute(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = vecs(spark, dir)
    val queries = broadcast(
      all.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn")))
    val scored = all.join(queries, $"vec_id" =!= $"query_id")
      .withColumn("cos", dot / ($"qn" * $"nrm"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"vec_id".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"query_id", $"vec_id".as("neighbor_id"),
        $"rank".cast("long").as("rank"), $"cos")
  }

  /** IVF-style ANN: probe only the query's own cluster (`label` = cluster
    * id), exact top-5 within it. The corpus side is pre-pruned by the join
    * key BEFORE any scoring — the property that makes IVF sub-linear.
    */
  def qKnnIvf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = vecs(spark, dir)
    val queries = broadcast(
      all.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"label".as("qlabel"),
          $"v".as("qv"), $"nrm".as("qn")))
    val scored = all
      .join(queries, $"label" === $"qlabel" && $"vec_id" =!= $"query_id")
      .withColumn("cos", dot / ($"qn" * $"nrm"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"vec_id".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"vec_id".as("neighbor_id"),
        $"rank".cast("long").as("rank"), $"cos")
  }

  /** IVF with LEARNED centroids: Lloyd k-means
    * ([[KMeans.fit]]: nlist=8, 3 iterations — an explicit index-build
    * action, like writing an index file; at 100 TB the centroids are
    * trained once and persisted), then multi-probe search: each query
    * probes its nprobe=2 nearest centroids and scores ONLY vectors
    * assigned to those lists — the corpus is pruned by the equi-join on
    * `cluster` BEFORE any scoring, the property that makes IVF sub-linear.
    *
    * No SQL oracle (k-means training is not SQL-expressible; the driver
    * records a rows-only check): the MECHANICS — convergence, assignment
    * purity, and recall vs brute ≥ 0.9 — are pinned by `KMeansSpec` on
    * synthetic clustered data. On the DRIVER's embeddings table recall vs
    * brute is inherently low for ANY index: the data is measured isotropic
    * noise (avg within-label cos 0.0016 vs 0.0003 across; label-IVF
    * achieves 0.08 recall vs brute), and ANN indexes only beat brute force
    * when the data has neighborhood structure.
    */
  def qKnnIvfKmeans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = vecs(spark, dir)
    val cents = KMeans.fitMemo(s"emb:$dir", all, "vec_id", "v", k = 8, iters = 3)
    val corpus = all
      .withColumn("cluster", KMeans.assignExpr($"v", cents))
    val queries = broadcast(
      all.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"),
          explode(KMeans.probeExpr($"v", cents, nprobe = 2)).as("cluster")))
    val scored = corpus
      .join(queries, Seq("cluster"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", dot / ($"qn" * $"nrm"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"vec_id".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"vec_id".as("neighbor_id"),
        $"rank".cast("long").as("rank"), $"cos")
  }

  /** Product-quantization ANN (the IVF-PQ codebook half): split the
    * 64-dim space into m=8 subspaces of 8 dims, train a 16-centroid
    * codebook per subspace ([[KMeans.fit]] over the slice — an index-BUILD
    * action, like the IVF fit), encode every corpus vector as 8 one-byte
    * codes, then answer queries by ASYMMETRIC DISTANCE COMPUTATION:
    * each query precomputes an 8×16 lookup table of
    * `||c||² − 2·q_j·c` subspace distances (the `||q_j||²` terms are
    * per-query constants — dropped, ranking-invariant), and scoring a
    * corpus point is 8 table lookups + adds instead of a 64-dim dot.
    *
    * The 100 TB arithmetic this buys (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search"): the corpus shrinks 32× (8 bytes of
    * codes vs 256 bytes of float32) — the index FITS where the vectors
    * don't — and scan cost per (query, point) drops from 64 mul-adds to 8
    * lookups. The LUT rides the broadcast query side (8×16 doubles per
    * query); the corpus side streams only (vec_id, codes).
    *
    * No SQL oracle (k-means codebooks are not SQL-expressible; rows-only
    * check — output is queries × 5, deterministic for the seeded init).
    * `PqSpec` pins the mechanics: codebook-exact corpora rank exactly, and
    * ADC neighbors stay inside the planted cluster on clustered data.
    */
  def qKnnPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = vecs(spark, dir)
    val (codes, luts) = Pq.index(all, s"emb:$dir", queryPred = $"vec_id" % 50 === 0)
    val scored = codes.join(broadcast(luts), $"vec_id" =!= $"query_id")
      .withColumn("adist", Pq.adcExpr)
    val w = Window.partitionBy($"query_id")
      .orderBy($"adist".asc, $"vec_id".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"vec_id".as("neighbor_id"),
        $"rank".cast("long").as("rank"), $"adist")
  }

  /** IVF-PQ — the composed index: coarse k-means clusters prune the
    * corpus (IVF half, equi-join on the probed cluster ids — sub-linear
    * candidate generation) and ADC scores only the bucket-mates (PQ half
    * — 8 lookups per candidate on an index 32× smaller than the raw
    * vectors). This is the structure of every production billion-vector
    * ANN deployment; the two halves are the independently-tested
    * [[KMeans]] and [[Pq]] components, composed. Codes are raw-vector PQ
    * (not residual-encoded — documented simplification; residual encoding
    * adds one subtraction before [[Pq.index]] and changes nothing
    * structural).
    *
    * Rows-only (two learned stages); the IVF mechanics are pinned by
    * `KMeansSpec`, the ADC mechanics by `PqSpec`, and the plan is pinned
    * quadratic-join-free by `PlanAssertionsSpec` — unlike `q_knn_pq`
    * (brute ADC scan), the join here is an equi-join on cluster id.
    */
  def qKnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = vecs(spark, dir)
    // shared artifacts: the coarse quantizer is the SAME trained index
    // q_knn_ivf_kmeans uses, and the codebooks are the ones q_knn_pq
    // trained — one training pass per session, like a persisted index file
    val coarse = KMeans.fitMemo(s"emb:$dir", all, "vec_id", "v", k = 8, iters = 3)
    val (codes, luts) = Pq.index(all, s"emb:$dir", queryPred = $"vec_id" % 50 === 0)
    val corpus = codes.join(
      all.select($"vec_id", KMeans.assignExpr($"v", coarse).as("cluster")),
      "vec_id")
    val queries = broadcast(
      all.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"),
          explode(KMeans.probeExpr($"v", coarse, nprobe = 2)).as("cluster"))
        .join(luts, "query_id"))
    val scored = corpus.join(queries, Seq("cluster"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("adist", Pq.adcExpr)
    val w = Window.partitionBy($"query_id")
      .orderBy($"adist".asc, $"vec_id".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"vec_id".as("neighbor_id"),
        $"rank".cast("long").as("rank"), $"adist")
  }

  /** PQ plumbing, split out so the spec drives the production encoder /
    * LUT / ADC on fixture corpora.
    */
  private[analytics] object Pq {
    val M = 8 // subspaces
    val Ksub = 16 // centroids per subspace

    /** Session-scoped trained-codebook store (same rationale as
      * [[KMeans.fitMemo]]: train once per (corpus, params), share across
      * every consumer — q_knn_pq and q_knn_ivfpq used to each train from
      * scratch).
      */
    private val trained = new java.util.concurrent.ConcurrentHashMap[
      String, Array[Array[Array[Double]]]]()

    /** (corpus codes, query LUTs) for a (vec_id, v) frame. `dim` is taken
      * from the first vector at fit time (the KMeans seed collect — part
      * of the same index-build action, not an extra pass). Encode and LUT
      * are single codegen'd kernels over the literal codebook matrix
      * ([[graft.functions.PqEncodeExpr]]/[[graft.functions.PqLutExpr]]) —
      * round 4's 128-subtree LUT projection spent ~10 s/query in
      * Janino/JIT before a single row moved.
      */
    def index(all: DataFrame, key: String,
        queryPred: org.apache.spark.sql.Column): (DataFrame, DataFrame) = {
      import all.sparkSession.implicits._
      val books = trained.computeIfAbsent(s"$key:m=$M:ksub=$Ksub:i=3",
        _ => fitAll(all, iters = 3)) // dim read from the seed collect
      val booksLit = typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)
      val codes = all.select($"vec_id",
        call_function("graft_pq_encode", $"v", booksLit).as("codes"))
      val luts = all.filter(queryPred)
        .select($"vec_id".as("query_id"),
          call_function("graft_pq_lut", $"v", booksLit).as("lut"))
      (codes, luts)
    }

    /** Σ_j lut[j][codes[j]] — the 8-lookup ADC score of a (codes, lut)
      * pair row, as one codegen'd kernel ([[graft.functions.AdcScore]]).
      */
    def adcExpr: org.apache.spark.sql.Column = expr("graft_adc(lut, codes)")

    /** Train ALL M codebooks with 4 driver actions total: the seed collect
      * grabs the Ksub lowest-id vectors ONCE (sliced driver-side into the
      * M initial codebooks), and each Lloyd iteration is ONE job over the
      * exploded (subspace, subvector) frame — a per-subspace `when` chain
      * routes each row to its own codebook's argmin, and one
      * groupBy(j, c, pos) re-centers every codebook together. Per-subspace
      * [[KMeans.fit]] calls would be M×(iters+1) serial driver round-trips
      * — measured ~30 s of pure job-launch latency at ANY data size; this
      * shape is iters+1 round-trips regardless of M.
      */
    def fitAll(all: DataFrame, iters: Int): Array[Array[Array[Double]]] = {
      import all.sparkSession.implicits._
      graft.functions.VectorFunctions.register(all.sparkSession)
      val seed = all.orderBy($"vec_id").limit(Ksub).select($"v").collect()
        .map(_.getSeq[Double](0).toArray)
      require(seed.length == Ksub, s"need ≥ $Ksub vectors to seed PQ codebooks")
      // dimensionality comes from the seed rows already in hand — no
      // separate first() driver action just to read the vector width
      val dim = seed.head.length
      require(dim % M == 0, s"dim $dim must split into $M subspaces")
      val dsub = dim / M
      var books: Array[Array[Array[Double]]] =
        Array.tabulate(M)(j => seed.map(_.slice(j * dsub, (j + 1) * dsub)))
      val sub = all.select($"vec_id", explode(array((0 until M).map(j =>
        struct(lit(j).as("j"), slice($"v", j * dsub + 1, dsub).as("sv"))): _*))
        .as("e"))
        .select($"e.j".as("j"), $"e.sv".as("sv"))
      (0 until iters).foreach { _ =>
        // per-subspace argmin routed by the j column through ONE literal
        // codebook matrix — the former M-way `when` chain of unrolled
        // argmins was a fresh giant codegen unit per Lloyd iteration
        val assign = call_function("graft_argmin_dot", $"j", $"sv",
          typedlit(books.map(_.map(_.toSeq).toSeq).toSeq))
        val sums = sub
          .withColumn("c", assign)
          .select($"j", $"c", posexplode($"sv").as(Seq("pos", "x")))
          .groupBy($"j", $"c", $"pos")
          .agg(sum($"x").as("sx"), count(lit(1)).as("n"))
          .collect()
        val acc = Array.fill(M, Ksub, dsub)(0.0)
        val n = Array.fill(M, Ksub)(0L)
        sums.foreach { r =>
          val j = r.getInt(0); val c = r.getInt(1); val pos = r.getInt(2)
          acc(j)(c)(pos) = r.getDouble(3); n(j)(c) = r.getLong(4)
        }
        books = Array.tabulate(M)(j => Array.tabulate(Ksub)(c =>
          if (n(j)(c) == 0L) books(j)(c) else acc(j)(c).map(_ / n(j)(c))))
      }
      books
    }
  }

  /** Per-cluster vector statistics: count, norm spread, centroid norm
    * (element-wise mean via posexplode → two tiny shuffles).
    */
  def qEmbeddingStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = vecs(spark, dir)
    val centroid = e
      .select($"label", posexplode($"v").as(Seq("pos", "x")))
      .groupBy($"label", $"pos").agg(avg($"x").as("cx"))
      .groupBy($"label").agg(sqrt(sum($"cx" * $"cx")).as("centroid_norm"))
    e.groupBy($"label")
      .agg(count(lit(1)).as("n"), avg($"nrm").as("avg_norm"),
        min($"nrm").as("min_norm"), max($"nrm").as("max_norm"))
      .join(centroid, "label")
      .select($"label".cast("long").as("label"), $"n", $"avg_norm",
        $"min_norm", $"max_norm", $"centroid_norm")
  }

  /** Int8 vector quantization (the PQ/SQ-prep shape of an ANN index
    * build): per-vector absmax scale, q = floor(x·127/mx), plus the
    * reconstruction-error summary. Pure scan-side projection — the
    * quantized table is what ships to the index at 1/4 the bytes; both
    * engines evaluate the identical IEEE expression tree, so floor
    * boundaries agree exactly. Output keyed `id` so the checker's
    * alphabetical column order pairs rows on the unique integer, not a
    * float.
    */
  def qEmbeddingQuantize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "embeddings")
      .select($"vec_id".as("id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("mx", expr("aggregate(v, 0.0d, (a, x) -> greatest(a, abs(x)))"))
      // mx > 0 pinned on both sides: an all-zero vector divides by zero —
      // NULL in Spark (dropped) vs inf in DuckDB (kept, then floor errors)
      .filter($"mx" > 0)
      .withColumn("q",
        expr("transform(v, x -> cast(floor(x * 127.0 / mx) as bigint))"))
      .select($"id", $"mx",
        expr("aggregate(q, 0L, (a, x) -> a + x)").as("sum_q"),
        expr("array_min(q)").as("min_q"),
        expr("array_max(q)").as("max_q"),
        expr("aggregate(zip_with(v, q, (x, b) -> abs(x - b * mx / 127.0))," +
          " 0.0d, (a, e) -> a + e) / size(v)").as("mean_abs_err"))
  }

  val queries: Map[String, CoreQueries.QFn] = Map(
    "q_knn_brute" -> qKnnBrute,
    "q_knn_ivf" -> qKnnIvf,
    "q_knn_ivf_kmeans" -> qKnnIvfKmeans,
    "q_knn_pq" -> qKnnPq,
    "q_knn_ivfpq" -> qKnnIvfPq,
    "q_embedding_stats" -> qEmbeddingStats,
    "q_embedding_quantize" -> qEmbeddingQuantize
  )

  val oracles: Map[String, String] = Map(
    "q_embedding_quantize" ->
      """WITH d AS (
        |  SELECT vec_id AS id, [x::DOUBLE FOR x IN embedding] AS v
        |  FROM embeddings),
        | m AS (
        |  SELECT id, v,
        |   list_reduce(list_prepend(0.0, v), (a, x) -> greatest(a, abs(x))) AS mx
        |  FROM d),
        | qq AS (
        |  SELECT id, v, mx,
        |   [floor(x * 127.0 / mx)::BIGINT FOR x IN v] AS q
        |  FROM m WHERE mx > 0)
        |SELECT id, mx,
        | list_sum(q)::BIGINT AS sum_q,
        | list_min(q) AS min_q, list_max(q) AS max_q,
        | list_sum([abs(v[i] - q[i] * mx / 127.0) FOR i IN range(1, len(v) + 1)])
        |   / len(v) AS mean_abs_err
        |FROM qq""".stripMargin,
    "q_knn_brute" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0),
        | s AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |   list_cosine_similarity(qv, e.embedding::DOUBLE[]) AS cos
        |  FROM q, embeddings e WHERE e.vec_id <> q.query_id)
        |SELECT query_id, neighbor_id, rank, cos FROM (
        |  SELECT query_id, neighbor_id, cos,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY cos DESC, neighbor_id ASC)::BIGINT AS rank
        |  FROM s) t WHERE rank <= 10""".stripMargin,
    "q_knn_ivf" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, label AS qlabel, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0),
        | s AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |   list_cosine_similarity(qv, e.embedding::DOUBLE[]) AS cos
        |  FROM q JOIN embeddings e ON e.label = q.qlabel
        |  WHERE e.vec_id <> q.query_id)
        |SELECT query_id, neighbor_id, rank, cos FROM (
        |  SELECT query_id, neighbor_id, cos,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY cos DESC, neighbor_id ASC)::BIGINT AS rank
        |  FROM s) t WHERE rank <= 5""".stripMargin,
    "q_embedding_stats" ->
      """WITH v AS (
        |  SELECT vec_id, label::BIGINT AS label, embedding::DOUBLE[] AS v,
        |   sqrt(list_sum([x * x FOR x IN embedding::DOUBLE[]])) AS nrm
        |  FROM embeddings),
        | c AS (
        |  SELECT label, pos, avg(x) AS cx FROM (
        |    SELECT label, unnest(v) AS x,
        |     generate_subscripts(v, 1) AS pos FROM v) t
        |  GROUP BY 1, 2),
        | cn AS (
        |  SELECT label, sqrt(sum(cx * cx)) AS centroid_norm FROM c GROUP BY 1)
        |SELECT v.label, count(*) AS n, avg(nrm) AS avg_norm,
        | min(nrm) AS min_norm, max(nrm) AS max_norm, any_value(centroid_norm) AS centroid_norm
        |FROM v JOIN cn ON v.label = cn.label
        |GROUP BY v.label""".stripMargin
  )
}
