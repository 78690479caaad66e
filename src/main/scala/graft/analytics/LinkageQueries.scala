package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.table

/** Record-linkage and span-level dedup operators — the corpus-hygiene
  * steps between raw ingest and the document-level dedup suite:
  *
  *   - [[qFuzzyJoin]]: blocked edit-distance linkage (the entity-resolution
  *     primitive — "same thing, dirty spelling");
  *   - [[qDedupSpans]]: exact duplicated-SPAN detection (the scalable
  *     approximation of suffix-array substring dedup from Lee et al.,
  *     "Deduplicating Training Data Makes Language Models Better" — find
  *     verbatim k-token runs shared across documents, the boilerplate /
  *     license-header / template signal document-level dedup misses);
  *   - [[qDedupSemantic]]: SemDeDup-style embedding dedup (Abbas et al.,
  *     "SemDeDup") — k-means partition, then prune cosine-near pairs
  *     WITHIN clusters only, making the quadratic verify cluster-local.
  *
  * Scale design shared with the dedup suite: no all-pairs joins (blocking /
  * span-grouping / clustering bound every pairwise step), no UDFs, no
  * driver-side jobs at plan time (k-means fit is an explicit index-build
  * ACTION, like writing an index file — not plan-construction metadata).
  */
object LinkageQueries {

  /** Blocked fuzzy self-join over part names: block on the last word (the
    * head noun), verify `levenshtein ≤ 4` within blocks, emit matched
    * pairs. The 100 TB shape of record linkage:
    *
    *   - dedup-first: distance runs over DISTINCT names, never over the
    *     row count — duplicate rows add zero verify cost (p_name is a
    *     5-word draw from a 92-word vocabulary, so distinct names still
    *     grow with part count; dedup removes the ROW multiplicity, not
    *     the name growth);
    *   - blocking: the equi-join on the block key means only same-block
    *     names ever meet — candidate volume is Σ (block size)², bounded
    *     by the block-size distribution, not corpus². Within-block pair
    *     volume grows quadratically in names-per-block, so a larger
    *     corpus needs finer blocking keys (head noun + first-word prefix,
    *     phonetic key, …) to keep blocks bounded; a skewed block is
    *     exactly the AQE skew-join / salting case the session already
    *     handles;
    *   - `levenshtein` is a codegen'd built-in in both engines, so the
    *     oracle is exact.
    */
  def qFuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val names = table(spark, dir, "part")
      .select($"p_name").distinct()
      .withColumn("blk", regexp_extract($"p_name", "([a-z]+)$", 1))
    names.as("a").join(names.as("b"),
        $"a.blk" === $"b.blk" && $"a.p_name" < $"b.p_name")
      .withColumn("dist", levenshtein($"a.p_name", $"b.p_name").cast("long"))
      .filter($"dist" <= 4)
      .select($"a.p_name".as("name_a"), $"b.p_name".as("name_b"), $"dist")
  }

  /** Word-8-gram spans of `text` (pre-split into `ws`), guarded so a short
    * doc still yields one (possibly shorter) span — oracle mirrors the
    * guard exactly.
    */
  private val spanExpr =
    "transform(sequence(1, greatest(size(ws) - 7, 1))," +
      " i -> concat_ws(' ', slice(ws, i, 8)))"

  /** Duplicated-span detection: for every document, how many of its
    * distinct word-8-gram spans appear verbatim in at least one OTHER
    * document (n-token-run dedup at span granularity — the practical
    * distributed stand-in for suffix-array substring dedup).
    *
    * Plan shape, one linear pass: repartition on doc_id → explode spans
    * (partition-local) → distinct (no exchange — doc_id clustering
    * satisfies the (doc_id, span) grouping by the subset rule) → ONE
    * shuffle on span grouping doc lists (list size = span's dup-cluster
    * size, bounded by duplication density, not corpus size) → explode back
    * → ONE shuffle on doc_id for the per-doc rollup. No self-join: the
    * span table is consumed once, counts ride along with the doc ids.
    * At 100 TB the span strings would hash to 64-bit fingerprints before
    * the shuffle (same plan, 8-byte keys); kept as strings here so the
    * oracle is string-exact.
    */
  def qDedupSpans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spanStats(table(spark, dir, "documents").select($"doc_id", $"text"))
  }

  /** Span-duplication stats of a (doc_id, text) frame — split out so the
    * spec drives the PRODUCTION operator on planted-run fixtures.
    */
  private[analytics] def spanStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    dupStats(
      docs.select($"doc_id", split($"text", " ").as("ws")),
      spanExpr, unitPrefix = "span")
  }

  /** The shared cross-document duplicate-unit rollup (consumed by span
    * dedup here and chunk dedup in [[MultimodalQueries]]): repartition on
    * doc_id → partition-local explode of `unitExpr` → distinct (no
    * exchange — doc_id clustering satisfies the (doc_id, unit) grouping
    * by the subset rule) → per-unit COUNT (one shuffle on unit content,
    * map-side partial agg) → join the count back onto the (doc_id, unit)
    * rows on the unit key → ONE shuffle on doc_id for the per-doc rollup.
    * No self-join, and no per-unit doc-id LIST: only the count `nd` is
    * needed downstream, and a universal unit (boilerplate present in
    * every document) would otherwise materialize a corpus-sized
    * collect_list in one task. The count join-back keys on the unit, so
    * even a universal unit costs one hot JOIN key (AQE-splittable), never
    * an unbounded buffer.
    */
  private[analytics] def dupStats(docs: DataFrame, unitExpr: String,
      unitPrefix: String): DataFrame = {
    import docs.sparkSession.implicits._
    val units = docs
      .repartition($"doc_id")
      .select($"doc_id", explode(expr(unitExpr)).as("u"))
      .distinct()
    val counts = units.groupBy($"u").agg(count(lit(1)).as("nd"))
    units.join(counts, "u")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as(s"n_${unitPrefix}s"),
        sum(when($"nd" > 1, 1L).otherwise(0L)).as(s"n_dup_${unitPrefix}s"))
      .select($"doc_id", col(s"n_${unitPrefix}s"), col(s"n_dup_${unitPrefix}s"),
        (col(s"n_dup_${unitPrefix}s").cast("double") / col(s"n_${unitPrefix}s"))
          .as("dup_frac"))
  }

  /** SemDeDup (semantic dedup): k-means over the embedding space, then
    * cosine-near pairs pruned WITHIN each cluster — the published recipe
    * for embedding-level dedup at web scale, where corpus-wide pair
    * generation is impossible but semantically-duplicate points land in
    * the same cluster. Reported per cluster: size, candidate-pair count,
    * pruned (non-keeper) count — keeper = lowest vec_id of a near pair.
    *
    * Scale: the quadratic step is cluster-local (cost Σ nᵢ², controlled
    * by k — at 100 TB k grows with the corpus so clusters stay bounded);
    * the cluster equi-join reuses one shuffle; scoring is the codegen'd
    * `graft_dot` kernel. `KMeans.fit` is an explicit index-build action
    * (train once, persist centroids, share across runs).
    *
    * Oracled EXACTLY, k-means included: the deterministic training loop
    * replays in DuckDB as unrolled Lloyd iterations
    * ([[SimilarityQueries.OracleSql.semanticDedup]] — shared with the ANN
    * oracles), then the same cluster-local pair prune and rollup.
    * `LinkageQueriesSpec` still pins the semantics: planted semantic
    * duplicates are pruned, distant points survive, keeper choice is the
    * min id.
    */
  def qDedupSemantic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val all = table(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
    // the SAME fingerprinted persistent artifact the ANN queries resolve
    // (SimilarityQueries.corpusKey): one coarse training per corpus,
    // shared across SemDeDup and the whole IVF family, in-session and out
    val cents = KMeans.fitPersistent(SimilarityQueries.indexRoot,
      SimilarityQueries.corpusKey(spark, dir),
      all, "vec_id", "v", k = 8, iters = 3)
    val c = all.withColumn("cluster", KMeans.assignExpr($"v", cents))
    semanticPrune(c, threshold = 0.46)
  }

  /** Cluster-local cosine prune of a (cluster, vec_id, v, nrm) frame —
    * split out so the spec can drive the production operator on fixture
    * clusters with planted duplicates.
    */
  private[analytics] def semanticPrune(c: DataFrame, threshold: Double): DataFrame = {
    import c.sparkSession.implicits._
    val a = c.select($"cluster", $"vec_id".as("id_a"), $"v".as("va"), $"nrm".as("na"))
    val b = c.select($"cluster", $"vec_id".as("id_b"), $"v".as("vb"), $"nrm".as("nb"))
    val near = a.join(b, "cluster")
      .filter($"id_a" < $"id_b")
      .withColumn("cos", expr("graft_dot(va, vb)") / ($"na" * $"nb"))
      .filter($"cos" >= threshold)
      .select($"cluster", $"id_a", $"id_b")
    // non-keeper = appears as the HIGHER id of some near pair; count each
    // pruned vector once (a doc near several keepers is still one removal)
    val pruned = near.select($"cluster", $"id_b".as("vec_id")).distinct()
      .groupBy($"cluster").agg(count(lit(1)).as("n_pruned"))
    val pairs = near.groupBy($"cluster").agg(count(lit(1)).as("n_near_pairs"))
    c.groupBy($"cluster").agg(count(lit(1)).as("n_vecs"))
      .join(pairs, Seq("cluster"), "left")
      .join(pruned, Seq("cluster"), "left")
      .select($"cluster".cast("long").as("cluster"), $"n_vecs",
        coalesce($"n_near_pairs", lit(0L)).as("n_near_pairs"),
        coalesce($"n_pruned", lit(0L)).as("n_pruned"))
  }

  val queries: Map[String, CoreQueries.QFn] = Map(
    "q_fuzzy_join" -> qFuzzyJoin,
    "q_dedup_spans" -> qDedupSpans,
    "q_dedup_semantic" -> qDedupSemantic
  )

  val oracles: Map[String, String] = Map(
    "q_dedup_semantic" -> SimilarityQueries.OracleSql.semanticDedup,
    "q_fuzzy_join" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        | k AS (
        |  SELECT p_name, regexp_extract(p_name, '([a-z]+)$', 1) AS blk
        |  FROM n)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        | levenshtein(a.p_name, b.p_name)::BIGINT AS dist
        |FROM k a JOIN k b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 4""".stripMargin,
    "q_dedup_spans" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        | sp AS (
        |  SELECT DISTINCT doc_id, unnest([array_to_string(ws[i:i+7], ' ')
        |    FOR i IN range(1, greatest(len(ws) - 7, 1) + 1)]) AS span
        |  FROM w),
        | cnt AS (SELECT span, count(*) AS nd FROM sp GROUP BY 1)
        |SELECT doc_id, count(*)::BIGINT AS n_spans,
        | count(CASE WHEN nd > 1 THEN 1 END)::BIGINT AS n_dup_spans,
        | count(CASE WHEN nd > 1 THEN 1 END)::DOUBLE / count(*) AS dup_frac
        |FROM sp JOIN cnt USING (span)
        |GROUP BY 1""".stripMargin
  )
}
