package graft.analytics

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.VersionedArtifact

/** PERSISTED MinHash-LSH index — the artifact every in-session dedup
  * scaladoc points at ("at 100 TB the corpus band table is the persisted
  * LSH index"): build once at corpus ingest, then every daily delta
  * probes it from disk without recomputing a single corpus signature.
  *
  * Two parquet tables inside each version:
  *   - `bands`       (band, sig, doc_id) — the banded bucket keys at the
  *                   build-time [[DedupIndex.Shape]] (recorded in the
  *                   artifact; corpus-scale 32×8/256 by default);
  *   - `signatures`  (doc_id, mhsig, hs, sz) — the per-doc sorted hash
  *                   sets the exact merge-scan verify reads.
  * Probing = the [[DedupQueries.qDedupIncremental]] plan with the corpus
  * side sourced from the artifact: delta signatures are computed
  * batch-locally ([[DedupQueries.signaturesOf]]), their band keys
  * equi-join the loaded band table, and candidates verify exactly against
  * the loaded signature sets — identical semantics to the in-session
  * index, spec-pinned (`DedupIndexSpec`).
  *
  * Versioning + idempotent probe-then-admit come from
  * [[graft.streaming.VersionedArtifact]] (atomic `_CURRENT` swap,
  * deltaId-recorded admissions, single-writer tripwire, hard-linked
  * carry): a RETRIED at-least-once admission is a no-op — duplicated
  * SIGNATURE rows would make the verify join emit every matching pair
  * once per copy (band-key duplicates are absorbed by the candidate
  * distinct, signature duplicates are not) — and a crash mid-admission
  * leaves the pointer on the intact previous version.
  *
  * At cluster scale the band write becomes `saveAsTable` with
  * `bucketBy(n, "band", "sig")` — SHIPPED as [[buildBucketedBands]] /
  * [[probeBucketed]], with `DedupIndexBucketedSpec` pinning pair parity
  * and the single-Exchange plan (corpus side read in place, only the
  * delta moves); the signature table would take `bucketBy(n, "doc_id")`
  * identically (left as the directory artifact here: the verify join is
  * candidate-bounded, so its corpus-side exchange carries only matched
  * rows, not the index). Staleness is the caller's contract, same as [[AnnIndex]]:
  * [[build]] rebuilds from scratch into a fresh version.
  */
object DedupIndex {

  /** A banded MinHash-LSH layout: `bands × rowsPerBand` over a
    * `slots`-wide signature (the registered kernels are 128- and
    * 256-slot; both draw from the SAME permutation stream, so a wider
    * signature extends a narrower one rather than reseeding it).
    *
    * The shape is the corpus-scale knob (SCALE.md "band-shape law"):
    * r=4 band values collide on background similarity as j₀⁴, r=8 as
    * j₀⁸ — measured ~400× fewer candidates at 50 k docs with identical
    * verified output. [[build]] RECORDS the shape in the artifact and
    * every probe/admit replays it; probing with a different shape than
    * the build would join band values from different slot ranges and
    * emit noise.
    */
  final case class Shape(bands: Int, rowsPerBand: Int, slots: Int) {
    require(bands * rowsPerBand <= slots,
      s"band shape $bands×$rowsPerBand exceeds the $slots-slot signature")
    require(slots == 128 || slots == 256,
      s"registered minhash kernels are 128/256-slot, got $slots")
  }

  object Shape {
    /** The oracle-matched 16×4/128 shape: recall-complete at j ≥ 0.8
      * (miss ≈ 4e-8 at the threshold), so the probe equals the EXACT
      * delta×corpus answer the DuckDB oracle computes. Candidate volume
      * grows as j₀⁴ — right at oracle scale, the quadratic direction at
      * corpus scale.
      */
    val Oracle: Shape = Shape(bands = 16, rowsPerBand = 4, slots = 128)

    /** The corpus-scale 32×8/256 default: 64-bit r=8 band values keep
      * noise collisions falling as j₀⁸ (measured ~400× fewer candidates
      * than r=4 at 50 k docs, identical verified output on this corpus —
      * `q_dedup_minhash256`'s calibration).
      */
    val Corpus: Shape = Shape(bands = 32, rowsPerBand = 8, slots = 256)
  }

  private val Tables = Seq("signatures", "bands")

  /** The shape the artifact was BUILT with — what every probe/admit must
    * replay. Pre-metadata artifacts (r12) read back as [[Shape.Oracle]],
    * the only shape that revision ever wrote.
    */
  def shapeOf(indexDir: String): Shape = {
    val m = artifact(indexDir).meta
    (m.get("bands"), m.get("rowsPerBand"), m.get("slots")) match {
      case (Some(b), Some(r), Some(s)) => Shape(b.toInt, r.toInt, s.toInt)
      case _ => Shape.Oracle
    }
  }

  /** Corpus-build counter — the [[AnnPersistSpec]]-style observability
    * hook: proves the oracled incremental face builds the artifact at
    * most once per corpus fingerprint and PROBES thereafter.
    */
  val buildRuns = new java.util.concurrent.atomic.AtomicLong(0)

  /** Whether the artifact has a committed current version (a crashed
    * build leaves no pointer → reads as absent).
    */
  def hasCurrent(indexDir: String): Boolean =
    artifact(indexDir).currentVersion.isDefined

  private def artifact(indexDir: String) = new VersionedArtifact(indexDir)

  /** The committed version id behind the _CURRENT pointer — one file
    * read; what a long-lived prober polls per micro-batch to bound its
    * cache's staleness to one batch (see `IngestDedup`).
    */
  def currentVersion(indexDir: String): Option[Long] =
    artifact(indexDir).currentVersion

  /** The current version's path for `table` — observability/spec hook;
    * multi-table READS should go through one [[VersionedArtifact
    * .snapshotPaths]] resolution, as [[probe]] does.
    */
  def tablePath(indexDir: String, table: String): String =
    artifact(indexDir).tablePath(table)

  /** Delta ids already admitted into the current version. */
  def appliedDeltas(indexDir: String): Set[String] =
    artifact(indexDir).appliedDeltas

  private def writeTables(docs: DataFrame, ver: File, mode: String,
      shape: Shape): Unit = {
    // signaturesOf already carries (doc_id, mhsig, hs, sz)
    val per = DedupQueries.signaturesOf(docs, shape.slots).persist()
    try {
      per.write.mode(mode).parquet(new File(ver, "signatures").toString)
      val bandCols = DedupQueries.bandStructs(shape.bands,
        shape.rowsPerBand, shape.slots)
      per.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
        .select(col("bs.band").as("band"), col("bs.sig").as("sig"),
          col("doc_id"))
        .write.mode(mode).parquet(new File(ver, "bands").toString)
    } finally { per.unpersist(); () }
  }

  /** Build (or fully REBUILD) the index from a `(doc_id, text)` corpus
    * frame — a fresh version with an empty admitted-delta set. `shape`
    * is recorded in the artifact and rules every later probe/admit; the
    * default is the corpus-scale [[Shape.Corpus]] banding (the oracled
    * face passes [[Shape.Oracle]] explicitly — recall-complete at its
    * oracle's exact j ≥ 0.8 answer).
    */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String,
      shape: Shape = Shape.Corpus): Unit = {
    buildRuns.incrementAndGet()
    artifact(indexDir).build(writeTables(docs, _, "overwrite", shape),
      buildMeta = Map("bands" -> shape.bands.toString,
        "rowsPerBand" -> shape.rowsPerBand.toString,
        "slots" -> shape.slots.toString))
  }

  /** ADMIT a delta (probe-then-admit lifecycle): true if admitted, false
    * if `deltaId` was already applied. O(|delta|) write — previous files
    * carry as hard links, only the delta's part files are new. Signatures
    * and bands at the shape the artifact records — never a caller choice.
    */
  def append(spark: SparkSession, docs: DataFrame, indexDir: String,
      deltaId: String): Boolean =
    artifact(indexDir).admit(deltaId, Tables,
      writeTables(docs, _, "append", shapeOf(indexDir)))

  /** Drop index versions older than the newest `keep` (default 2: a
    * reader holding the previous version's paths — a lazy probe frame,
    * the ingest stream's cached corpus — survives one admission; consume
    * lazy frames before pruning deeper).
    */
  def prune(indexDir: String, keep: Int = 2): Unit =
    artifact(indexDir).prune(keep)

  /** Compact tables that accreted more than `maxFiles` part files across
    * admissions (measured in `IndexProbe`: 64 files PER admitted delta,
    * forever) — out-of-band, behind the same atomic version swap as
    * admission, delta-idempotence carried. Bands re-cluster on `band` so
    * the probe's equi-join reads co-located buckets; probe output is
    * multiset-invariant across a compact (`DedupIndexSpec`). Run from the
    * admission loop (single-writer contract).
    */
  def compact(spark: SparkSession, indexDir: String,
      maxFiles: Int = 64): Int =
    artifact(indexDir).compact(Tables, maxFiles) { (src, tgt) =>
      val df = spark.read.parquet(src)
      val out =
        if (tgt.getName == "bands") df.repartition(col("band"))
        else df.repartition(col("doc_id"))
      out.write.mode("overwrite").parquet(tgt.toString)
    }

  /** CLUSTER-SCALE band layout — the `bucketBy` upgrade the class doc
    * names, shipped: write the corpus band table as a managed parquet
    * table bucketed (and sorted) on the probe's join key `(band, sig)`,
    * so every later probe's candidate equi-join reads corpus buckets IN
    * PLACE — the corpus side reports its bucket `HashPartitioning` to the
    * planner and only the delta side exchanges
    * (`DedupIndexBucketedSpec` pins the single-Exchange plan and pair
    * parity with the directory artifact's probe). At 100 TB this is the
    * difference between shuffling the standing index per probe and
    * shuffling the delta only; bucket count targets ~128–512 MB per
    * bucket file, the [[Bucketing]] sizing rule.
    */
  def buildBucketedBands(spark: SparkSession, docs: DataFrame,
      table: String, buckets: Int = 0,
      shape: Shape = Shape.Corpus): Unit = {
    val per = DedupQueries.signaturesOf(docs, shape.slots).persist()
    try {
      val bandCols = DedupQueries.bandStructs(shape.bands,
        shape.rowsPerBand, shape.slots)
      // buckets = 0: size from bytes (Bucketing rule) — band rows are
      // docs × bands at ~24 B (band, sig, doc_id); the count rides the
      // persisted signature frame the write reuses (never a second scan
      // of the source). A toy-corpus build gets 1 bucket, a 100 TB one
      // the count its bytes ask for (capped at the session's bucketBy
      // ceiling), and an explicit count stays available for
      // layout-pinning specs
      val n = if (buckets > 0) buckets
        else Bucketing.sizedBuckets(per.count() * shape.bands * 24L,
          maxBuckets = Bucketing.sessionMaxBuckets(spark))
      per.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
        .select(col("bs.band").as("band"), col("bs.sig").as("sig"),
          col("doc_id"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
        .bucketBy(n, "band", "sig").sortBy("band", "sig")
        .saveAsTable(table)
      recordShape(spark, table, shape)
    } finally { per.unpersist(); () }
  }

  /** The managed-table twin of the directory artifact's `_meta.txt`: the
    * band shape rides the table's TBLPROPERTIES, so a probe can never
    * band its delta differently than the table was built (the silent
    * near-empty join a caller-guess default invites — same contract as
    * [[shapeOf]]).
    */
  private def recordShape(spark: SparkSession, table: String,
      shape: Shape): Unit =
    Bucketing.setTableProps(spark, table, Map(
      "graft.bands" -> shape.bands.toString,
      "graft.rowsPerBand" -> shape.rowsPerBand.toString,
      "graft.slots" -> shape.slots.toString))

  /** Shape recorded by [[buildBucketedBands]]. A table WITHOUT recorded
    * properties is a LOUD error, not a guessed default: it is either a
    * pre-metadata build (whose default changed across revisions — any
    * guess silently near-empties the probe for half of them) or a build
    * that crashed between `saveAsTable` and the property write; both
    * want a rebuild (or a deliberate one-time `ALTER TABLE … SET
    * TBLPROPERTIES`), not silent garbage.
    */
  def bucketedShapeOf(spark: SparkSession, table: String): Shape = {
    val props = Bucketing.tableProps(spark, table)
    (props.get("graft.bands"), props.get("graft.rowsPerBand"),
        props.get("graft.slots")) match {
      case (Some(b), Some(r), Some(s)) => Shape(b.toInt, r.toInt, s.toInt)
      case _ => throw new IllegalStateException(
        s"band table $table has no recorded shape (pre-metadata build, " +
          "or a build interrupted before its property write): rebuild " +
          "with buildBucketedBands, or record the build shape once via " +
          "ALTER TABLE ... SET TBLPROPERTIES ('graft.bands' = '<bands>', " +
          "'graft.rowsPerBand' = '<rows>', 'graft.slots' = '<slots>')")
    }
  }

  /** The signature-table counterpart of [[buildBucketedBands]] — the
    * VERIFY side's corpus state as a `bucketBy(doc_id)` managed table, so
    * the exact-Jaccard verify's corpus-sets join reads buckets in place:
    * [[DedupQueries.verifyJaccardSplit]]'s first join attaches A-side
    * sets to the narrow candidate rows, and with this layout the corpus
    * side reports its bucket partitioning while only the candidates
    * exchange (`DedupIndexBucketedSpec` pins the plan). Completes the
    * cluster-scale layout: bands AND signatures both read in place, so a
    * probe moves the delta and the matched candidates — nothing
    * corpus-sized.
    */
  def buildBucketedSignatures(spark: SparkSession, docs: DataFrame,
      table: String, buckets: Int = 0,
      shape: Shape = Shape.Corpus): Unit = {
    val per = DedupQueries.signaturesOf(docs, shape.slots).persist()
    try {
      // buckets = 0: per-doc row ≈ slots × 8 (signature) + the distinct
      // 5-char shingle hash set (~200 tokens × 8 B on the measured
      // corpus) — nominal 2 kB + signature width; counted on the
      // persisted frame the write reuses
      val n = if (buckets > 0) buckets
        else Bucketing.sizedBuckets(per.count() * (shape.slots * 8L + 2048L),
          maxBuckets = Bucketing.sessionMaxBuckets(spark))
      per.write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
        .bucketBy(n, "doc_id").sortBy("doc_id")
        .saveAsTable(table)
    } finally { per.unpersist(); () }
  }

  /** The raw candidate join against a [[buildBucketedBands]] table,
    * BEFORE the dedup distinct — exposed so the plan-shape spec can
    * assert the corpus side joins with no Exchange (the distinct above it
    * necessarily adds one for its own aggregation).
    */
  private[graft] def bucketedCandidates(spark: SparkSession, table: String,
      deltaPer: DataFrame, shape: Shape = Shape.Corpus): DataFrame = {
    val bandCols = DedupQueries.bandStructs(shape.bands,
      shape.rowsPerBand, shape.slots)
    val deltaBands = deltaPer
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("bs.band").as("band"), col("bs.sig").as("sig"),
        col("doc_id").as("id_b"))
    spark.table(table).withColumnRenamed("doc_id", "id_a")
      .join(deltaBands, Seq("band", "sig"))
      .where(col("id_a") =!= col("id_b"))
  }

  /** [[probe]] against the bucketed band table: same verified pairs, the
    * corpus-side exchange elided by layout. `corpusPer` is the signature
    * frame the exact verify reads (from the directory artifact or a
    * doc_id-bucketed table of its own). The band shape is resolved from
    * the TABLE's recorded properties ([[bucketedShapeOf]]) — never a
    * caller guess.
    */
  def probeBucketed(spark: SparkSession, table: String, corpusPer: DataFrame,
      deltaDocs: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val shape = bucketedShapeOf(spark, table)
    val deltaPer = DedupQueries.signaturesOf(deltaDocs, shape.slots)
    val cand = bucketedCandidates(spark, table, deltaPer, shape)
      .select(col("id_a"), col("id_b")).distinct()
    DedupQueries.verifyJaccardSplit(corpusPer, deltaPer, cand, 0.8)
      .select(col("id_a").as("corpus_id"), col("id_b").as("new_id"),
        col("jaccard"))
  }

  /** Probe the index with a `(doc_id, text)` delta frame: verified
    * near-dup pairs (corpus_id, new_id, jaccard ≥ 0.8) between the delta
    * and the indexed corpus. Cost is O(|delta| + matches) — nothing
    * corpus-sized is computed, only scanned through the equi-join. Both
    * artifact tables resolve against ONE pointer read, so a concurrent
    * admission cannot hand the verify a different version than the
    * candidate join.
    */
  def probe(spark: SparkSession, indexDir: String,
      deltaDocs: DataFrame): DataFrame =
    probeLoaded(load(spark, indexDir), deltaDocs)

  /** The artifact's tables + shape resolved against ONE pointer read —
    * what a LONG-LIVED prober (the streaming text-ingest face) loads
    * once and persists, so every micro-batch probes memory instead of
    * re-reading (or worse, re-deriving) corpus-sized state.
    */
  final case class Loaded(signatures: DataFrame, bands: DataFrame,
      shape: Shape)

  /** Artifact-load counter — see [[SrpIndex.loadRuns]]. */
  val loadRuns = new java.util.concurrent.atomic.AtomicLong(0)

  def load(spark: SparkSession, indexDir: String): Loaded = {
    loadRuns.incrementAndGet()
    // shape resolved from the artifact BEFORE the path snapshot: both
    // come from the same current version under the single-writer contract
    val shape = shapeOf(indexDir)
    val paths = artifact(indexDir).snapshotPaths(Tables)
    Loaded(spark.read.parquet(paths("signatures")),
      spark.read.parquet(paths("bands")), shape)
  }

  /** [[probe]] against pre-loaded (possibly persisted) artifact frames.
    *
    * `micro = true` declares `deltaDocs` a MICRO-BATCH (the streaming
    * ingest face): delta bands and candidates broadcast into the corpus
    * joins, so the cached band/signature tables STREAM with zero
    * per-batch exchange — see [[ContainIndex.probeLoaded]].
    */
  def probeLoaded(loaded: Loaded, deltaDocs: DataFrame,
      micro: Boolean = false): DataFrame = {
    val spark = deltaDocs.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val shape = loaded.shape
    val corpusBands = loaded.bands.withColumnRenamed("doc_id", "id_a")
    // no persist: the probe returns a LAZY frame, and a persist here with
    // no unpersist would pin a cache entry per daily probe for the life
    // of the ingest session; the delta-sized recompute across the frame's
    // few consumers is cheaper than that leak
    val deltaPer = DedupQueries.signaturesOf(deltaDocs, shape.slots)
    val bandCols = DedupQueries.bandStructs(shape.bands,
      shape.rowsPerBand, shape.slots)
    val deltaBands = deltaPer
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("bs.band").as("band"), col("bs.sig").as("sig"),
        col("doc_id").as("id_b"))
    // id_a =!= id_b: a RE-probe after admission (the at-least-once retry
    // the deltaId-idempotent admit exists for) would otherwise match every
    // delta doc against its own admitted copy at jaccard 1.0 and report
    // the whole retried delta as corpus duplicates — a keeper policy
    // downstream would then drop it. Batch faces filter the same way.
    val deltaSide = if (micro) broadcast(deltaBands) else deltaBands
    val cand = deltaSide.join(corpusBands, Seq("band", "sig"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    DedupQueries.verifyJaccardSplit(loaded.signatures, deltaPer, cand, 0.8,
        micro)
      .select(col("id_a").as("corpus_id"), col("id_b").as("new_id"),
        col("jaccard"))
  }
}
