package graft.analytics

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.VersionedArtifact

/** PERSISTED containment index — the artifact
  * [[DedupQueries.qDedupContainmentIncremental]]'s scaladoc names ("the
  * part a production deployment persists"): built once at corpus ingest,
  * probed by every delta with O(|delta| × df) compute.
  *
  * Four parquet tables inside each version (16-char shingle unit,
  * fragment floor n ≥ 20 applied at build):
  *   - `tokens` (hx, doc_id) — the full inverted index (new-in-old
  *     probes land here);
  *   - `prefix` (hx, doc_id) — each doc's ⌊n/10⌋+1 rarest tokens (~10 %
  *     of `tokens`; old-in-new probes land here — the reason this
  *     direction never scans corpus-sized state);
  *   - `sets`   (doc_id, hs, sz) — sorted hash sets for the exact
  *     merge-scan verify;
  *   - `df`     (hx, df) — corpus document frequencies, used to rank the
  *     DELTA's prefix tokens rarest-first at probe time.
  * Probe-time df is corpus-df (frozen at build; unseen delta tokens rank
  * rarest at df 0): the prefix pigeonhole is ORDER-INDEPENDENT (any
  * ⌊n/10⌋+1 distinct shingles of the contained doc witness containment),
  * so frozen df costs efficiency at worst, never recall —
  * `ContainIndexSpec` pins probe output equal to the in-session
  * incremental face, which ranks by live df.
  *
  * Versioning + idempotent probe-then-admit come from
  * [[graft.streaming.VersionedArtifact]], shared with [[DedupIndex]]:
  * a retried at-least-once admission is a no-op (duplicate `sets` rows
  * would double every pair the verify join emits), a crash mid-admission
  * leaves the previous version intact, and probes resolve every table
  * against one pointer read.
  */
object ContainIndex {

  private val Tables = Seq("tokens", "prefix", "sets", "df")

  /** Corpus-build counter — see [[DedupIndex.buildRuns]]. */
  val buildRuns = new java.util.concurrent.atomic.AtomicLong(0)

  /** Whether the artifact has a committed current version. */
  def hasCurrent(indexDir: String): Boolean =
    artifact(indexDir).currentVersion.isDefined

  private def artifact(indexDir: String) = new VersionedArtifact(indexDir)

  /** The committed version id behind the _CURRENT pointer — one file
    * read; what a long-lived prober polls per micro-batch to bound its
    * cache's staleness to one batch (see `IngestDedup`).
    */
  def currentVersion(indexDir: String): Option[Long] =
    artifact(indexDir).currentVersion

  private def shingled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(expr(DedupQueries.containShingleExpr)).as("sh"))
      .distinct()
      .select(col("doc_id"), xxhash64(col("sh")).as("hx"))

  /** The (doc_id, sorted hash set, sz) frame of a shingle projection,
    * fragment floor n >= 20 applied — ONE definition (the containRanked
    * precedent) so the floor and the set encoding can never drift
    * between the artifact build, the probes, and the bucketed layout,
    * whose pair parity is spec-pinned against each other.
    */
  private def setsOf(sh: DataFrame): DataFrame =
    sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("hx"))).as("hs"))
      .withColumn("sz", size(col("hs")).cast("long"))
      .filter(col("sz") >= 20)

  /** The current version's path for `table` — observability/spec hook. */
  def tablePath(indexDir: String, table: String): String =
    artifact(indexDir).tablePath(table)

  /** Delta ids already admitted into the current version. */
  def appliedDeltas(indexDir: String): Set[String] =
    artifact(indexDir).appliedDeltas

  private def writePostings(r: DataFrame, sh: DataFrame, ver: File,
      mode: String): Unit = {
    r.select(col("hx"), col("doc_id"))
      .write.mode(mode).parquet(new File(ver, "tokens").toString)
    DedupQueries.containPrefix(r)
      .select(col("hx"), col("doc_id"))
      .write.mode(mode).parquet(new File(ver, "prefix").toString)
    setsOf(sh)
      .write.mode(mode).parquet(new File(ver, "sets").toString)
  }

  /** Build (or fully REBUILD, re-freshening df) from a `(doc_id, text)`
    * corpus frame.
    */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String): Unit = {
    buildRuns.incrementAndGet()
    artifact(indexDir).build { next =>
      val sh = shingled(docs).persist()
      try {
        val dfTable = sh.groupBy(col("hx")).agg(count(lit(1)).as("df"))
        dfTable.write.mode("overwrite")
          .parquet(new File(next, "df").toString)
        writePostings(DedupQueries.containRanked(sh, dfTable), sh, next,
          "overwrite")
      } finally { sh.unpersist(); () }
    }
  }

  /** ADMIT a delta (probe-then-admit lifecycle): true if admitted, false
    * if `deltaId` was already applied. The delta's prefixes are ranked
    * by the FROZEN corpus df (unseen tokens rarest) and df is NOT
    * rewritten — safe by the pigeonhole's order-independence, and
    * precisely what keeps admission O(|delta|): a df rewrite would be a
    * corpus-sized job on every ingest. Re-freshen df with a periodic
    * [[build]] when probe cost drifts.
    */
  def append(spark: SparkSession, docs: DataFrame, indexDir: String,
      deltaId: String): Boolean = {
    val corpusDfPath = artifact(indexDir).tablePath("df")
    artifact(indexDir).admit(deltaId, Tables, { next =>
      val sh = shingled(docs).persist()
      try {
        val corpusDf = spark.read.parquet(corpusDfPath)
        writePostings(DedupQueries.containRanked(sh, corpusDf), sh, next,
          "append")
      } finally { sh.unpersist(); () }
    })
  }

  /** Drop index versions older than the newest `keep` (default 2 — see
    * [[DedupIndex.prune]]'s reader-grace note).
    */
  def prune(indexDir: String, keep: Int = 2): Unit =
    artifact(indexDir).prune(keep)

  /** Compact tables past `maxFiles` part files — see
    * [[DedupIndex.compact]] (same versioned-swap transaction, same
    * multiset invariance, spec-pinned in `ContainIndexSpec`). Postings
    * re-cluster on the token hash (the probes' equi-join key), sets on
    * doc_id.
    */
  def compact(spark: SparkSession, indexDir: String,
      maxFiles: Int = 64): Int =
    artifact(indexDir).compact(Tables, maxFiles) { (src, tgt) =>
      val df = spark.read.parquet(src)
      val out =
        if (tgt.getName == "sets") df.repartition(col("doc_id"))
        else df.repartition(col("hx"))
      out.write.mode("overwrite").parquet(tgt.toString)
    }

  /** CLUSTER-SCALE layout — the [[DedupIndex.buildBucketedBands]]
    * treatment for the containment family: all four corpus tables as
    * managed parquet tables bucketed (and sorted) on their probe-side
    * join keys — `tokens`/`prefix`/`df` on the token hash `hx` (the
    * candidate equi-joins and the delta's rarest-first ranking join),
    * `sets` on `doc_id` (the exact verify lookup) — so a probe reads
    * every corpus table IN PLACE and only the delta's frames (and the
    * candidate rows) exchange (`ContainIndexBucketedSpec` pins the
    * plans and pair parity with the directory artifact's probe).
    */
  def buildBucketedTables(spark: SparkSession, docs: DataFrame,
      tablePrefix: String, buckets: Int = 0): Unit = {
    import org.apache.spark.sql.SaveMode
    val sh = shingled(docs).persist()
    val dfFrame = sh.groupBy(col("hx")).agg(count(lit(1)).as("df"))
    try {
      // buckets = 0: per-table sizing from bytes (Bucketing rule),
      // counted on the persisted shingle frame. tokens = the full
      // posting list at ~16 B/row; prefix ≈ 1/10 of it; df = one row
      // per DISTINCT token (counted on the df frame the write reuses —
      // sizing df by posting rows would over-bucket by the corpus's
      // average token frequency, and a separate distinct() would pay the
      // same aggregation twice); sets pack the same hashes as tokens at
      // ~8 B plus per-doc framing
      val shRows = if (buckets > 0) 0L else sh.count()
      // persist only when the sizing count adds a second consumer; with
      // explicit buckets the write is the frame's single action. The
      // release rides the outer finally (a failed write must not leak a
      // corpus-sized cache entry for the session's life).
      if (buckets == 0) { dfFrame.persist(); () }
      val dfRows = if (buckets > 0) 0L else dfFrame.count()
      val cap = Bucketing.sessionMaxBuckets(spark)
      def n(bytes: Long): Int =
        if (buckets > 0) buckets
        else Bucketing.sizedBuckets(bytes, maxBuckets = cap)
      val tokenN = n(shRows * 16L)
      val prefixN = n(shRows * 16L / 10)
      val setsN = n(shRows * 9L)
      dfFrame
        .write.mode(SaveMode.Overwrite).format("parquet")
        .bucketBy(n(dfRows * 16L), "hx").sortBy("hx")
        .saveAsTable(s"${tablePrefix}_df")
      // early release on success (the heavy tokens/prefix/sets writes
      // below never read dfFrame — containRanked reads the WRITTEN
      // table); the finally's second unpersist is an idempotent no-op
      // and covers the failed-write path
      dfFrame.unpersist()
      val r = DedupQueries.containRanked(sh,
        spark.table(s"${tablePrefix}_df"))
      r.select(col("hx"), col("doc_id"))
        .write.mode(SaveMode.Overwrite).format("parquet")
        .bucketBy(tokenN, "hx").sortBy("hx")
        .saveAsTable(s"${tablePrefix}_tokens")
      DedupQueries.containPrefix(r).select(col("hx"), col("doc_id"))
        .write.mode(SaveMode.Overwrite).format("parquet")
        .bucketBy(prefixN, "hx").sortBy("hx")
        .saveAsTable(s"${tablePrefix}_prefix")
      setsOf(sh)
        .write.mode(SaveMode.Overwrite).format("parquet")
        .bucketBy(setsN, "doc_id").sortBy("doc_id")
        .saveAsTable(s"${tablePrefix}_sets")
    } finally { sh.unpersist(); dfFrame.unpersist(); () }
  }

  /** [[probe]] against [[buildBucketedTables]] output — same verified
    * pairs, every corpus-side exchange elided by layout. The verify runs
    * SPLIT per direction ([[DedupQueries.verifyContainmentSplit]]): each
    * side of each verify join is unique by construction (delta sets vs
    * corpus sets — a delta doc re-probed after admission reads its set
    * from the delta side, identical content), so the directory probe's
    * union + anti-join never materialize and the bucketed corpus `sets`
    * table joins in place. The final distinct collapses the one overlap
    * a RE-probe can produce (a pair whose both docs sit in delta AND
    * admitted corpus arrives from both directions).
    */
  def probeBucketed(spark: SparkSession, tablePrefix: String,
      deltaDocs: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val sh = shingled(deltaDocs)
    val r = DedupQueries.containRanked(sh, spark.table(s"${tablePrefix}_df"))
    val deltaPrefix = DedupQueries.containPrefix(r)
      .select(col("hx"), col("doc_id"))
    val deltaTokens = r.select(col("hx"), col("doc_id"))
    val corpusTokens = spark.table(s"${tablePrefix}_tokens")
    val corpusPrefix = spark.table(s"${tablePrefix}_prefix")
    val candNewInOld = deltaPrefix.withColumnRenamed("doc_id", "id_a")
      .join(corpusTokens.withColumnRenamed("doc_id", "id_b"), "hx")
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val candOldInNew = corpusPrefix.withColumnRenamed("doc_id", "id_a")
      .join(deltaTokens.withColumnRenamed("doc_id", "id_b"), "hx")
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val deltaSets = setsOf(sh)
    val corpusSets = spark.table(s"${tablePrefix}_sets")
    DedupQueries.verifyContainmentSplit(deltaSets, corpusSets, candNewInOld)
      .unionByName(
        DedupQueries.verifyContainmentSplit(corpusSets, deltaSets,
          candOldInNew))
      .distinct()
  }

  /** Probe with a `(doc_id, text)` delta frame: ordered containment
    * pairs (id_a contained-in id_b, ≥ 0.9) with exactly one side in the
    * delta — both directions found by delta-sized probes of the standing
    * tables (delta prefixes × `tokens`, delta tokens × `prefix`). All
    * four artifact tables resolve against ONE pointer read.
    *
    * `id_a =!= id_b` keeps a RE-probe (the at-least-once retry path)
    * free of containment-1.0 self-pairs, same as every incremental
    * face. Verify shape is mode-dependent — see [[probeLoaded]].
    */
  def probe(spark: SparkSession, indexDir: String,
      deltaDocs: DataFrame): DataFrame =
    probeLoaded(load(spark, indexDir), deltaDocs)

  /** The artifact's four tables resolved against ONE pointer read — what
    * a LONG-LIVED prober (the streaming containment-ingest face) loads
    * once and persists, so every micro-batch probes memory instead of
    * re-reading corpus-sized postings from the lake.
    */
  final case class Loaded(tokens: DataFrame, prefix: DataFrame,
      sets: DataFrame, df: DataFrame)

  /** Artifact-load counter — see [[SrpIndex.loadRuns]]. */
  val loadRuns = new java.util.concurrent.atomic.AtomicLong(0)

  def load(spark: SparkSession, indexDir: String): Loaded = {
    loadRuns.incrementAndGet()
    val paths = artifact(indexDir).snapshotPaths(Tables)
    Loaded(spark.read.parquet(paths("tokens")),
      spark.read.parquet(paths("prefix")),
      spark.read.parquet(paths("sets")),
      spark.read.parquet(paths("df")))
  }

  /** [[probe]] against pre-loaded (possibly persisted) artifact frames.
    *
    * `micro = true` declares `deltaDocs` a MICRO-BATCH (the streaming
    * ingest face, where admission control bounds the delta per trigger):
    * delta-derived sides broadcast into every corpus join, so the cached
    * corpus tables STREAM — no per-batch exchange or sort of
    * corpus-sized postings (the dominant per-batch term at 10× corpus,
    * measured in `IngestProbe`). Batch probes keep the default: a daily
    * delta is not broadcast-bounded.
    */
  def probeLoaded(loaded: Loaded, deltaDocs: DataFrame,
      micro: Boolean = false): DataFrame = {
    val spark = deltaDocs.sparkSession
    graft.functions.VectorFunctions.register(spark)
    // no persist — see DedupIndex.probe: a lazy return plus an
    // un-released cache entry per daily probe is a session-length leak
    val sh = shingled(deltaDocs)
    // micro: containRanked's left join would exchange+sort the corpus df
    // table per batch (left-outer can't broadcast its preserved side);
    // shrink df to the delta's tokens first — corpus df STREAMS against
    // the broadcast token set, and the left join downstream is
    // delta×delta (unseen tokens still coalesce to df 0 = rarest)
    val dfForRank =
      if (micro)
        // outer broadcast: containRanked's LEFT join can then take this
        // delta-bounded frame as its broadcast build side too
        broadcast(
          loaded.df.join(broadcast(sh.select(col("hx")).distinct()), "hx"))
      else loaded.df
    val r = DedupQueries.containRanked(sh, dfForRank)
    def side(d: DataFrame): DataFrame = if (micro) broadcast(d) else d
    val deltaPrefix = DedupQueries.containPrefix(r)
      .select(col("hx"), col("doc_id"))
    val deltaTokens = r.select(col("hx"), col("doc_id"))
    val corpusTokens = loaded.tokens
    val corpusPrefix = loaded.prefix
    val rawNewInOld = side(deltaPrefix.withColumnRenamed("doc_id", "id_a"))
      .join(corpusTokens.withColumnRenamed("doc_id", "id_b"), "hx")
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
    val rawOldInNew = corpusPrefix.withColumnRenamed("doc_id", "id_a")
      .join(side(deltaTokens.withColumnRenamed("doc_id", "id_b")), "hx")
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
    val deltaSets = setsOf(sh)
    val corpusSets = loaded.sets
    if (micro)
      // split per direction, distinct per direction: each verify side is
      // unique by construction, so with the delta broadcast the corpus
      // sets STREAM twice from cache — cheap for a micro-batch, and the
      // only shape that keeps the whole plan exchange-free
      // (IngestMicroPlanSpec); the final distinct collapses the one
      // overlap a RE-probe can produce
      DedupQueries.verifyContainmentSplit(deltaSets, corpusSets,
          rawNewInOld.distinct(), micro = true)
        .unionByName(DedupQueries.verifyContainmentSplit(corpusSets,
          deltaSets, rawOldInNew.distinct(), micro = true))
        .distinct()
    else {
      // batch shape: ONE candidate distinct and ONE verify pass over a
      // per-doc-unique union — a daily delta pays the corpus-side
      // exchanges once, not once per direction (the per-direction shape
      // measured ×1.8–2.2 on this face's bench line). On a RE-probe the
      // delta's docs also sit in the admitted `sets` table, so prefer
      // the delta-side set (identical content — same doc_id ⇒ same text
      // ⇒ same hash set) and anti-join the corpus sets against the
      // delta's doc_ids.
      val cand = rawNewInOld.unionByName(rawOldInNew).distinct()
      val per = corpusSets
        .join(deltaSets.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .unionByName(deltaSets)
      DedupQueries.verifyContainment(per, cand)
    }
  }
}
