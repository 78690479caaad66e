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

  /** Where persisted ANN artifacts live. Defaults to a per-host scratch
    * dir; a deployment points it at a lake path so index-build jobs and
    * search sessions share artifacts across machines.
    */
  private[analytics] def indexRoot: String =
    sys.props.get("graft.ann.index.dir") // spec override (env is immutable in-JVM)
      .orElse(sys.env.get("SPARK_GRAFT_INDEX_DIR"))
      .getOrElse(s"${sys.props("java.io.tmpdir")}/graft-ann-index")

  /** Fingerprinted corpus key for the embeddings source: the artifact is
    * addressed by WHAT was trained on (content fingerprint), not WHERE it
    * lived (path) — rewriting the data at the same path can never serve a
    * stale index, and the same data at two paths shares one artifact.
    */
  private[analytics] def corpusKey(spark: SparkSession, dir: String): String =
    s"emb-${AnnIndex.sourceFingerprint(spark, s"$dir/embeddings.parquet")}"

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
    * Oracled EXACTLY, k-means included: the training loop is deterministic
    * by construction (init = the k lowest-id vectors in id order, fixed 3
    * iterations, argmin ties to the lowest centroid id, empty clusters
    * keep their previous centroid), so the DuckDB oracle replays the SAME
    * three Lloyd iterations as unrolled SQL (see [[kmeansOracleSql]]) and
    * reproduces centroids, probe sets, and the final top-5 lists. The only
    * engine divergence is float summation ORDER in the per-cluster means
    * (both sides sum in data order), a ~1e-15 relative drift that cannot
    * flip an argmin unless two centroids are equidistant to ~1e-14 —
    * vanishingly unlikely off the exact-tie case, which the id tie-break
    * already pins. The MECHANICS (convergence, assignment purity, recall
    * vs brute ≥ 0.9 on clustered data) remain pinned by `KMeansSpec`;
    * recall on the driver's isotropic-noise embeddings is inherently low
    * for ANY index (avg within-label cos 0.0016 vs 0.0003 across).
    */
  def qKnnIvfKmeans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = vecs(spark, dir)
    val cents = KMeans.fitPersistent(indexRoot, corpusKey(spark, dir),
      all, "vec_id", "v", k = 8, iters = 3)
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
    * Oracled EXACTLY, codebook training included: [[Pq.fitAll]] is
    * deterministic (seeded init from the Ksub lowest-id slices, fixed 3
    * iterations, id tie-breaks), so the DuckDB oracle replays the joint
    * per-subspace Lloyd loop as unrolled SQL ([[OracleSql.knnPq]]) and
    * reproduces codes, LUTs, and the ADC top-5. `PqSpec` still pins the
    * mechanics: codebook-exact corpora rank exactly, and ADC neighbors
    * stay inside the planted cluster on clustered data.
    */
  def qKnnPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = vecs(spark, dir)
    val (codes, luts) = Pq.index(all, indexRoot, corpusKey(spark, dir),
      queryPred = $"vec_id" % 50 === 0)
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
    * Oracled EXACTLY despite the two learned stages — the coarse k-means
    * and PQ codebook CTE chains of the component oracles compose the same
    * way the Spark plans do ([[OracleSql.knnIvfPq]]). The IVF mechanics
    * are pinned by `KMeansSpec`, the ADC mechanics by `PqSpec`, and the
    * plan is pinned quadratic-join-free by `PlanAssertionsSpec` — unlike
    * `q_knn_pq` (brute ADC scan), the join here is an equi-join on
    * cluster id.
    */
  def qKnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = vecs(spark, dir)
    // shared artifacts: the coarse quantizer is the SAME trained index
    // q_knn_ivf_kmeans uses, and the codebooks are the ones q_knn_pq
    // trained — one training pass per session, like a persisted index file
    val key = corpusKey(spark, dir)
    val coarse = KMeans.fitPersistent(indexRoot, key,
      all, "vec_id", "v", k = 8, iters = 3)
    val (codes, luts) = Pq.index(all, indexRoot, key,
      queryPred = $"vec_id" % 50 === 0)
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

  /** RESIDUAL-encoded IVF-PQ — the full Jégou et al. construction, no
    * simplifications left: the PQ codebooks are trained on the coarse
    * RESIDUALS `v − c(v)` (which concentrate near the origin, so the 16
    * centroids/subspace spend their resolution on the part of the vector
    * the coarse quantizer did NOT explain), and a query builds a SEPARATE
    * ADC table per probed list from ITS residual against that list's
    * centroid, `q − c_list` — the detail plain `q_knn_ivfpq` elides by
    * quantizing raw vectors. Costs at 100 TB are unchanged from the plain
    * variant (the residual is one codegen'd `zip_with` at encode/probe
    * time; the per-(query, list) LUT rides the broadcast side exactly like
    * the per-query one), which is why production systems always residual-
    * encode: same plan, strictly better quantization.
    *
    * Oracled EXACTLY like its siblings ([[OracleSql.knnIvfPqRes]]): the
    * coarse chain, the residual projection, and the residual-trained
    * codebook chain are all deterministic replays.
    */
  def qKnnIvfPqRes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = vecs(spark, dir)
    val key = corpusKey(spark, dir)
    val coarse = KMeans.fitPersistent(indexRoot, key,
      all, "vec_id", "v", k = 8, iters = 3)
    val coarseLit = typedlit(coarse.map(_.toSeq).toSeq)
    // corpus residuals: r = v − coarse[cluster], elementwise (codegen'd)
    val assigned = all
      .withColumn("cluster", KMeans.assignExpr($"v", coarse))
      .withColumn("r", zip_with($"v",
        element_at(coarseLit, $"cluster" + 1), (a, b) => a - b))
    // residual books are keyed by the RAW corpus fingerprint (residuals
    // derive deterministically from it via the coarse chain) with a
    // variant tag, so they persist/share like the raw-vector books
    val books = Pq.booksPersistent(indexRoot,
      assigned.select($"vec_id", $"r".as("v")), s"$key-res")
    val booksLit = typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = assigned.select($"vec_id", $"cluster",
      call_function("graft_pq_encode", $"r", booksLit).as("codes"))
    // per-(query, probed list) LUT from the query's residual vs THAT list
    val queries = broadcast(
      all.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"))
        .withColumn("cluster",
          explode(KMeans.probeExpr($"qv", coarse, nprobe = 2)))
        .withColumn("qr", zip_with($"qv",
          element_at(coarseLit, $"cluster" + 1), (a, b) => a - b))
        .select($"query_id", $"cluster",
          call_function("graft_pq_lut", $"qr", booksLit).as("lut")))
    val scored = codes.join(queries, Seq("cluster"))
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

  /** Two-stage retrieval: IVF-PQ ADC shortlist (top-20 per query — cheap,
    * compressed-domain) RE-RANKED by exact cosine over the raw vectors
    * (top-5) — the standard production construction for recovering the
    * recall PQ quantization loses: the index answers from 8-byte codes,
    * and only shortlist·k raw vectors are ever touched (Jégou et al. §V,
    * "re-ranking with source coding"). At 100 TB the raw-vector fetch is
    * an equi-join on vec_id against the (tiny) candidate list — the
    * corpus-side vector table is never scanned for scoring, and the
    * queries ride the broadcast side of both stages.
    *
    * Oracled EXACTLY like its siblings: the composed coarse+PQ chains
    * produce the same deterministic shortlist (adist ties broken by id),
    * and the re-rank is plain exact cosine — [[OracleSql.knnIvfPqRerank]].
    */
  def qKnnIvfPqRerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = vecs(spark, dir)
    val key = corpusKey(spark, dir)
    val coarse = KMeans.fitPersistent(indexRoot, key,
      all, "vec_id", "v", k = 8, iters = 3)
    val (codes, luts) = Pq.index(all, indexRoot, key,
      queryPred = $"vec_id" % 50 === 0)
    val corpus = codes.join(
      all.select($"vec_id", KMeans.assignExpr($"v", coarse).as("cluster")),
      "vec_id")
    val probed = broadcast(
      all.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"),
          explode(KMeans.probeExpr($"v", coarse, nprobe = 2)).as("cluster"))
        .join(luts, "query_id"))
    val wAdc = Window.partitionBy($"query_id")
      .orderBy($"adist".asc, $"vec_id".asc)
    val shortlist = corpus.join(probed, Seq("cluster"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("adist", Pq.adcExpr)
      .withColumn("crank", row_number().over(wAdc))
      .filter($"crank" <= 20)
      .select($"query_id", $"vec_id")
    // exact re-rank: candidates fetch their raw vectors by equi-join;
    // query vectors broadcast (the corpus is never scanned for scoring)
    val qv = broadcast(
      all.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn")))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"vec_id".asc)
    shortlist
      .join(all.select($"vec_id", $"v", $"nrm"), "vec_id")
      .join(qv, "query_id")
      .withColumn("cos", dot / ($"qn" * $"nrm"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"vec_id".as("neighbor_id"),
        $"rank".cast("long").as("rank"), $"cos")
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
    /** The trained codebooks for a (vec_id, v) frame, memoized on the
      * caller's corpus key — the shared index artifact every consumer
      * (plain PQ, IVF-PQ, residual IVF-PQ) reads instead of re-training.
      */
    def booksFor(all: DataFrame, key: String): Array[Array[Array[Double]]] =
      trained.computeIfAbsent(s"$key:m=$M:ksub=$Ksub:i=3",
        _ => fitAll(all, iters = 3)) // dim read from the seed collect

    /** Training-run counter + memo clear — same observability contract as
      * [[KMeans.fitRuns]]/[[KMeans.clearMemo]].
      */
    val fitAllRuns = new java.util.concurrent.atomic.AtomicLong(0)
    def clearMemo(): Unit = trained.clear()

    /** [[booksFor]] with the persisted-artifact half: memo → parquet
      * artifact ([[AnnIndex.loadBooks]]) → train-and-save. `key` must
      * embed the source fingerprint (see [[KMeans.fitPersistent]]).
      */
    def booksPersistent(root: String, all: DataFrame,
        key: String): Array[Array[Array[Double]]] = {
      val spark = all.sparkSession
      val memoKey = s"$key:m=$M:ksub=$Ksub:i=3"
      trained.computeIfAbsent(memoKey, _ => {
        val path = s"$root/${AnnIndex.sanitize(memoKey)}/books"
        if (AnnIndex.exists(spark, path)) AnnIndex.loadBooks(spark, path)
        else {
          val books = fitAll(all, iters = 3)
          AnnIndex.saveBooks(spark, path, books)
          books
        }
      })
    }

    def index(all: DataFrame, root: String, key: String,
        queryPred: org.apache.spark.sql.Column): (DataFrame, DataFrame) = {
      import all.sparkSession.implicits._
      val books = booksPersistent(root, all, key)
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
      fitAllRuns.incrementAndGet()
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
    "q_knn_ivfpq_res" -> qKnnIvfPqRes,
    "q_knn_ivfpq_rerank" -> qKnnIvfPqRerank,
    "q_embedding_stats" -> qEmbeddingStats,
    "q_embedding_quantize" -> qEmbeddingQuantize
  )

  /** DuckDB replay of the LEARNED indexes, as generated SQL. The training
    * loops are deterministic by construction (seeded init from the lowest
    * ids, fixed iteration count, argmin ties to the lowest centroid id,
    * empty clusters keep their previous centroid), so k-means and the PQ
    * codebooks are SQL-expressible as UNROLLED Lloyd iterations — each one
    * an (assign, re-center) CTE pair mirroring the Spark kernels: the same
    * `‖c‖² − 2·v·c` argmin, means as sum/count (not AVG), ascending-index
    * float sums. The only engine divergence is summation ORDER in the
    * distributed means (~1e-15 relative), which cannot flip an argmin
    * unless two centroids are equidistant to ~1e-14 — and exact ties
    * resolve identically via the id tie-break.
    */
  private[analytics] object OracleSql {

    /** ‖cv‖² − 2·(x·cv), ascending-index sums like the Spark kernels. */
    private def dist(x: String): String =
      s"list_sum([cv[i] * cv[i] FOR i IN range(1, len(cv) + 1)])" +
        s" - 2 * list_sum([$x[i] * cv[i] FOR i IN range(1, len(cv) + 1)])"

    /** One Lloyd iteration over full vectors: assignment `a$i` under
      * centroids `c${i-1}`, means `m$i`, refreshed centroids `c$i`.
      */
    private def kmeansIter(i: Int): String = {
      val p = i - 1
      s""" a$i AS MATERIALIZED (
         |  SELECT vec_id, v, c FROM (
         |   SELECT vv.vec_id, vv.v, c$p.c,
         |    row_number() OVER (PARTITION BY vv.vec_id
         |      ORDER BY ${dist("v")}, c$p.c) AS rk
         |   FROM vv CROSS JOIN c$p) t WHERE rk = 1),
         | m$i AS MATERIALIZED (
         |  SELECT c, pos, sum(x) / count(*) AS mx FROM (
         |   SELECT c, unnest(v) AS x, generate_subscripts(v, 1) AS pos
         |   FROM a$i) t GROUP BY 1, 2),
         | c$i AS MATERIALIZED (
         |  SELECT c$p.c, coalesce(m.cv, c$p.cv) AS cv
         |  FROM c$p LEFT JOIN (
         |   SELECT c, list(mx ORDER BY pos) AS cv FROM m$i GROUP BY c) m
         |   USING (c)),""".stripMargin
    }

    /** Shared coarse-quantizer CTE chain ([[KMeans.fit]] k=8, iters=3):
      * `vv` (double vectors), `c0`..`c3` (centroid generations), `af`
      * (final corpus assignment), `q` (query vectors), `probes` (each
      * query's nprobe=2 nearest centroid ids).
      */
    private def coarseCtes: String =
      s"""vv AS MATERIALIZED (
         |  SELECT vec_id, embedding::DOUBLE[] AS v
         |  FROM embeddings),
         | c0 AS MATERIALIZED (
         |  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS c, v AS cv
         |  FROM (SELECT vec_id, v FROM vv ORDER BY vec_id LIMIT 8)),
         |${kmeansIter(1)}
         |${kmeansIter(2)}
         |${kmeansIter(3)}
         | af AS MATERIALIZED (
         |  SELECT vec_id, v, c FROM (
         |   SELECT vv.vec_id, vv.v, c3.c,
         |    row_number() OVER (PARTITION BY vv.vec_id
         |      ORDER BY ${dist("v")}, c3.c) AS rk
         |   FROM vv CROSS JOIN c3) t WHERE rk = 1),
         | q AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv FROM vv WHERE vec_id % 50 = 0),
         | probes AS MATERIALIZED (
         |  SELECT query_id, c AS cluster FROM (
         |   SELECT q.query_id, c3.c,
         |    row_number() OVER (PARTITION BY q.query_id
         |      ORDER BY ${dist("qv")}, c3.c) AS rk
         |   FROM q CROSS JOIN c3) t WHERE rk <= 2),""".stripMargin

    /** [[qKnnIvfKmeans]]: coarse chain + exact cosine within the probed
      * clusters.
      */
    def knnIvfKmeans: String =
      s"""WITH $coarseCtes
         | s AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id,
         |   list_cosine_similarity(q.qv, a.v) AS cos
         |  FROM probes p
         |  JOIN af a ON a.c = p.cluster
         |  JOIN q ON q.query_id = p.query_id
         |  WHERE a.vec_id <> p.query_id)
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT query_id, neighbor_id, cos,
         |   row_number() OVER (PARTITION BY query_id
         |     ORDER BY cos DESC, neighbor_id ASC)::BIGINT AS rank
         |  FROM s) t WHERE rank <= 5""".stripMargin

    /** One Lloyd iteration over the (vec_id, j, sv) subvector frame
      * ([[Pq.fitAll]]'s joint-training shape): per-subspace assignment
      * `p$i` under codebooks `b${i-1}`, means `n$i`, refreshed `b$i`.
      */
    private def pqIter(i: Int): String = {
      val p = i - 1
      s""" p$i AS MATERIALIZED (
         |  SELECT vec_id, j, sv, c FROM (
         |   SELECT s.vec_id, s.j, s.sv, b.c,
         |    row_number() OVER (PARTITION BY s.vec_id, s.j
         |      ORDER BY ${dist("sv")}, b.c) AS rk
         |   FROM sub s JOIN b$p b ON b.j = s.j) t WHERE rk = 1),
         | n$i AS MATERIALIZED (
         |  SELECT j, c, pos, sum(x) / count(*) AS mx FROM (
         |   SELECT j, c, unnest(sv) AS x, generate_subscripts(sv, 1) AS pos
         |   FROM p$i) t GROUP BY 1, 2, 3),
         | b$i AS MATERIALIZED (
         |  SELECT b.j, b.c, coalesce(m.cv, b.cv) AS cv
         |  FROM b$p b LEFT JOIN (
         |   SELECT j, c, list(mx ORDER BY pos) AS cv FROM n$i GROUP BY j, c) m
         |   USING (j, c)),""".stripMargin
    }

    /** Shared PQ CTE chain ([[Pq.fitAll]] M=8, Ksub=16, iters=3 over
      * dsub=8 slices of `src`'s `v` column — raw vectors for plain PQ,
      * coarse residuals for the residual variant): `sub` (subvector
      * frame), `b0`..`b3` (codebook generations), `pf` (final
      * per-subspace corpus codes), `lutv` (each query's per-(j, c) ADC
      * table entries, raw-vector flavor).
      */
    private def pqCtes(src: String): String =
      s""" sub AS MATERIALIZED (
         |  SELECT vec_id, j, [v[j * 8 + i] FOR i IN range(1, 9)] AS sv
         |  FROM $src CROSS JOIN (SELECT unnest(range(0, 8)) AS j)),
         | b0 AS MATERIALIZED (
         |  SELECT s.j,
         |   (row_number() OVER (PARTITION BY s.j ORDER BY s.vec_id) - 1)::INT AS c,
         |   s.sv AS cv
         |  FROM sub s
         |  WHERE s.vec_id IN (SELECT vec_id FROM vv ORDER BY vec_id LIMIT 16)),
         |${pqIter(1)}
         |${pqIter(2)}
         |${pqIter(3)}
         | pf AS MATERIALIZED (
         |  SELECT vec_id, j, c FROM (
         |   SELECT s.vec_id, s.j, b.c,
         |    row_number() OVER (PARTITION BY s.vec_id, s.j
         |      ORDER BY ${dist("sv")}, b.c) AS rk
         |   FROM sub s JOIN b3 b ON b.j = s.j) t WHERE rk = 1),
         | lutv AS MATERIALIZED (
         |  SELECT qs.vec_id AS query_id, b.j, b.c, ${dist("qs.sv")} AS d
         |  FROM sub qs JOIN b3 b ON b.j = qs.j
         |  WHERE qs.vec_id % 50 = 0),""".stripMargin

    /** ADC top-5: Σ_j lut[j][codes[j]] per (query, corpus) pair, from the
      * `pf` codes and `lutv` entries of [[pqCtes]], restricted by
      * `candPred` (TRUE = brute ADC scan; IVF-PQ narrows it).
      */
    private def adcTopK(candJoin: String): String =
      s""" ad AS (
         |  SELECT l.query_id, pf.vec_id AS neighbor_id, sum(l.d) AS adist
         |  FROM pf JOIN lutv l ON l.j = pf.j AND l.c = pf.c
         |  $candJoin
         |  WHERE pf.vec_id <> l.query_id
         |  GROUP BY 1, 2)
         |SELECT query_id, neighbor_id, rank, adist FROM (
         |  SELECT query_id, neighbor_id, adist,
         |   row_number() OVER (PARTITION BY query_id
         |     ORDER BY adist ASC, neighbor_id ASC)::BIGINT AS rank
         |  FROM ad) t WHERE rank <= 5""".stripMargin

    /** [[LinkageQueries.qDedupSemantic]]: the same coarse k-means chain,
      * then cluster-local cosine-near pairs (threshold 0.46, matching the
      * Spark call) rolled up per cluster. A threshold flip would need a
      * pair's cosine within ~1e-15 of 0.46 — negligible off planted ties.
      */
    def semanticDedup: String =
      s"""WITH $coarseCtes
         | near AS (
         |  SELECT a.c AS cluster, a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM af a JOIN af b ON a.c = b.c AND a.vec_id < b.vec_id
         |  WHERE list_cosine_similarity(a.v, b.v) >= 0.46),
         | pruned AS (
         |  SELECT cluster, count(*) AS n_pruned
         |  FROM (SELECT DISTINCT cluster, id_b FROM near) GROUP BY 1),
         | pairs AS (
         |  SELECT cluster, count(*) AS n_near_pairs FROM near GROUP BY 1),
         | sizes AS (SELECT c AS cluster, count(*) AS n_vecs FROM af GROUP BY 1)
         |SELECT s.cluster::BIGINT AS cluster, s.n_vecs,
         | coalesce(p.n_near_pairs, 0)::BIGINT AS n_near_pairs,
         | coalesce(pr.n_pruned, 0)::BIGINT AS n_pruned
         |FROM sizes s
         |LEFT JOIN pairs p USING (cluster)
         |LEFT JOIN pruned pr USING (cluster)""".stripMargin

    /** [[qKnnPq]]: brute ADC scan over the codes. */
    def knnPq: String =
      s"""WITH vv AS MATERIALIZED (
         |  SELECT vec_id, embedding::DOUBLE[] AS v
         |  FROM embeddings),
         |${pqCtes("vv")}
         |${adcTopK("")}""".stripMargin

    /** [[qKnnIvfPq]]: coarse probes prune the candidates, ADC scores the
      * rest — the composed index, oracle-composed the same way.
      */
    def knnIvfPq: String =
      s"""WITH $coarseCtes
         |${pqCtes("vv")}
         |${adcTopK(
        """JOIN af a ON a.vec_id = pf.vec_id
          |  JOIN probes pr ON pr.cluster = a.c AND pr.query_id = l.query_id""".stripMargin)}""".stripMargin

    /** [[qKnnIvfPqRerank]]: the IVF-PQ ADC chain truncated to a top-20
      * shortlist, then exact-cosine re-ranked over the raw vectors.
      */
    def knnIvfPqRerank: String =
      s"""WITH $coarseCtes
         |${pqCtes("vv")}
         | ad AS (
         |  SELECT l.query_id, pf.vec_id AS neighbor_id, sum(l.d) AS adist
         |  FROM pf JOIN lutv l ON l.j = pf.j AND l.c = pf.c
         |  JOIN af a ON a.vec_id = pf.vec_id
         |  JOIN probes pr ON pr.cluster = a.c AND pr.query_id = l.query_id
         |  WHERE pf.vec_id <> l.query_id
         |  GROUP BY 1, 2),
         | cand AS (
         |  SELECT query_id, neighbor_id FROM (
         |   SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY adist ASC, neighbor_id ASC) AS crank
         |   FROM ad) t WHERE crank <= 20),
         | ex AS (
         |  SELECT c.query_id, c.neighbor_id,
         |   list_cosine_similarity(q.qv, v.v) AS cos
         |  FROM cand c
         |  JOIN q ON q.query_id = c.query_id
         |  JOIN vv v ON v.vec_id = c.neighbor_id)
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT query_id, neighbor_id, cos,
         |   row_number() OVER (PARTITION BY query_id
         |     ORDER BY cos DESC, neighbor_id ASC)::BIGINT AS rank
         |  FROM ex) t WHERE rank <= 5""".stripMargin

    /** [[qKnnIvfPqRes]]: the full residual construction — codebooks
      * trained on `v − c(v)` (the `rr` frame feeds the PQ chain), and a
      * per-(query, probed list) LUT from the query's residual against
      * that list's centroid.
      */
    def knnIvfPqRes: String =
      s"""WITH $coarseCtes
         | rr AS MATERIALIZED (
         |  SELECT a.vec_id,
         |   [a.v[i] - cv[i] FOR i IN range(1, len(cv) + 1)] AS v,
         |   a.c AS cluster
         |  FROM af a JOIN c3 ON c3.c = a.c),
         |${pqCtes("rr")}
         | qres AS MATERIALIZED (
         |  SELECT p.query_id, p.cluster,
         |   [q.qv[i] - cv[i] FOR i IN range(1, len(cv) + 1)] AS qr
         |  FROM probes p
         |  JOIN q ON q.query_id = p.query_id
         |  JOIN c3 ON c3.c = p.cluster),
         | qsub AS MATERIALIZED (
         |  SELECT query_id, cluster, j,
         |   [qr[j * 8 + i] FOR i IN range(1, 9)] AS sv
         |  FROM qres CROSS JOIN (SELECT unnest(range(0, 8)) AS j)),
         | lutr AS MATERIALIZED (
         |  SELECT qs.query_id, qs.cluster, b.j, b.c, ${dist("qs.sv")} AS d
         |  FROM qsub qs JOIN b3 b ON b.j = qs.j),
         | ad AS (
         |  SELECT l.query_id, pf.vec_id AS neighbor_id, sum(l.d) AS adist
         |  FROM pf
         |  JOIN rr ON rr.vec_id = pf.vec_id
         |  JOIN lutr l ON l.cluster = rr.cluster
         |   AND l.j = pf.j AND l.c = pf.c
         |  WHERE pf.vec_id <> l.query_id
         |  GROUP BY 1, 2)
         |SELECT query_id, neighbor_id, rank, adist FROM (
         |  SELECT query_id, neighbor_id, adist,
         |   row_number() OVER (PARTITION BY query_id
         |     ORDER BY adist ASC, neighbor_id ASC)::BIGINT AS rank
         |  FROM ad) t WHERE rank <= 5""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_knn_ivf_kmeans" -> OracleSql.knnIvfKmeans,
    "q_knn_pq" -> OracleSql.knnPq,
    "q_knn_ivfpq" -> OracleSql.knnIvfPq,
    "q_knn_ivfpq_res" -> OracleSql.knnIvfPqRes,
    "q_knn_ivfpq_rerank" -> OracleSql.knnIvfPqRerank,
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
