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
  * Two tables inside each version:
  *   - `bands`       — the banded bucket keys at the build-time
  *                   [[DedupIndex.Shape]] (recorded in the artifact;
  *                   corpus-scale 32×8/256 by default);
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
  * TWO LAYOUTS, ONE ARTIFACT FAMILY (r13 verdict's unification):
  *   - the plain DIRECTORY layout (`build(…, bucketed = false)`) —
  *     `bands` = (band, sig, doc_id) parquet read with
  *     `spark.read.parquet`; probes shuffle both join sides. The
  *     catalog-free fallback the parity specs compare against.
  *   - the BUCKETED layout — the build DEFAULT, what every production
  *     caller (the oracled incremental faces, the streaming ingest
  *     trio) builds and a 100 TB deployment uses for BOTH the daily
  *     batch and the streaming face — `bands` = (bk, doc_id) with
  *     `bk = xxhash64(band, sig)`, written as an external bucketed table
  *     (bucketBy bk) inside the SAME version dirs via [[IndexLayout]];
  *     `signatures` bucketBy doc_id. Probes read the corpus side IN
  *     PLACE (bucket HashPartitioning reported, only the delta
  *     exchanges — `DedupIndexBucketedSpec` pins the plan), micro
  *     probes BUCKET-PRUNE the band scan to the delta's key set, and
  *     admission/compaction keep the layout (bucket ids ride file
  *     names, which hard links preserve; appends land at the recorded
  *     modulus). The single-column bk key is what makes pruning
  *     possible (Spark prunes single-column bucket specs only); a bk
  *     collision can only ADD a candidate, which the exact verify
  *     filters like any other non-pair — same contract as every LSH
  *     candidate stage here.
  * The layout rides `_meta.txt` ([[IndexLayout.isBucketed]]), so
  * [[probe]]/[[append]]/[[load]]/[[compact]] — and therefore the
  * streaming ingest faces, which go through [[load]] — pick the right
  * read/write path with zero caller involvement.
  *
  * Staleness is the caller's contract, same as [[AnnIndex]]: [[build]]
  * rebuilds from scratch into a fresh version.
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
  def shapeOf(indexDir: String): Shape = shapeOfMeta(artifact(indexDir).meta)

  private def shapeOfMeta(m: Map[String, String]): Shape =
    (m.get("bands"), m.get("rowsPerBand"), m.get("slots")) match {
      case (Some(b), Some(r), Some(s)) => Shape(b.toInt, r.toInt, s.toInt)
      case _ => Shape.Oracle
    }

  /** Corpus-build counter — the [[AnnPersistSpec]]-style observability
    * hook: proves the oracled incremental face builds the artifact at
    * most once per corpus fingerprint and PROBES thereafter.
    */
  val buildRuns = new java.util.concurrent.atomic.AtomicLong(0)

  /** Carrier conf (`spark.graft.index.carrier`): `manifest` makes
    * [[build]] record [[VersionedArtifact.ManifestMeta]] in the
    * artifact, so every later lifecycle transaction carries untouched
    * files as `_carry.txt` REFERENCES (zero links, zero copies — the
    * object-store carry) and prune becomes reference-counted vacuum.
    * Read at BUILD only; the choice then rides the artifact's meta like
    * the band shape (a probe/admit never re-reads the conf). Reads of a
    * manifest artifact resolve through [[graft.streaming
    * .VersionedStore.logicalFiles]] ([[load]]'s manifest branch) and
    * MOUNT as per-version symlink trees registered with the same
    * bucketed catalog entries as the link carrier
    * ([[IndexLayout.mountManifest]] — the local stand-in for a table
    * format's metadata layer), so probe plans are carrier-identical:
    * in-place corpus scans, bucket pruning, L0 legs. Default:
    * absent = hard-link carry.
    */
  val CarrierConf = "spark.graft.index.carrier"

  /** The conf's meta contribution — shared by all three index families'
    * builds so the carrier choice cannot drift between them.
    */
  private[analytics] def carrierMetaOf(
      spark: SparkSession): Map[String, String] =
    if (spark.conf.getOption(CarrierConf)
        .contains(VersionedArtifact.ManifestValue))
      VersionedArtifact.ManifestMeta
    else Map.empty

  private def carrierMeta(spark: SparkSession): Map[String, String] =
    carrierMetaOf(spark)

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

  /** The directory-layout band projection: (band, sig, doc_id). */
  private def bandFrame(per: DataFrame, shape: Shape): DataFrame = {
    val bandCols = DedupQueries.bandStructs(shape.bands,
      shape.rowsPerBand, shape.slots)
    per.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("bs.band").as("band"), col("bs.sig").as("sig"),
        col("doc_id"))
  }

  /** The bucketed-layout band projection: (bk, doc_id) with
    * `bk = xxhash64(band, sig)` — the single-column join/bucket/prune
    * key (see class doc), 16 B/row vs the directory layout's 40.
    */
  private def bucketedBandFrame(per: DataFrame, shape: Shape): DataFrame =
    bandFrame(per, shape)
      .select(xxhash64(col("band"), col("sig")).as("bk"), col("doc_id"))

  private def writeTables(docs: DataFrame, ver: File, mode: String,
      shape: Shape): Unit = {
    // signaturesOf already carries (doc_id, mhsig, hs, sz)
    val per = DedupQueries.signaturesOf(docs, shape.slots).persist()
    try {
      per.write.mode(mode).parquet(new File(ver, "signatures").toString)
      bandFrame(per, shape)
        .write.mode(mode).parquet(new File(ver, "bands").toString)
    } finally { per.unpersist(); () }
  }

  /** The bucketed-layout ADMISSION write: `signatures` appends at the
    * bucket modulus (doc_id-keyed — a delta's rows touch ≤ |delta|
    * buckets, already delta-bounded), `bands` lands as L0 accrual
    * ([[IndexLayout.l0Append]]) — a delta's |delta| × bands band rows
    * hash across ~EVERY bucket, so the modulus append wrote one file
    * per bucket per admission, the fan-out that scales with the
    * corpus's bucket count instead of the batch.
    */
  private def writeTablesBucketed(family: String, docs: DataFrame,
      ver: File, meta: Map[String, String], shape: Shape): Unit = {
    val per = DedupQueries.signaturesOf(docs, shape.slots).persist()
    try {
      IndexLayout.writeInto(per, family, "signatures", ver,
        IndexLayout.specOf(meta, "signatures"), overwrite = false)
      IndexLayout.fanoutAppend(bucketedBandFrame(per, shape), family,
        "bands", ver, IndexLayout.specOf(meta, "bands"))
    } finally { per.unpersist(); () }
  }

  /** Build (or fully REBUILD) the index from a `(doc_id, text)` corpus
    * frame — a fresh version with an empty admitted-delta set. `shape`
    * is recorded in the artifact and rules every later probe/admit; the
    * default is the corpus-scale [[Shape.Corpus]] banding (the oracled
    * face passes [[Shape.Oracle]] explicitly — recall-complete at its
    * oracle's exact j ≥ 0.8 answer).
    *
    * The BUCKETED layout (class doc) is the DEFAULT — the layout every
    * production caller (the oracled incremental faces, the streaming
    * ingest trio) builds and probes: bucket counts are byte-sized
    * ([[Bucketing.sizedBuckets]], session-cap clamped) unless `buckets`
    * pins them (layout-pinning specs), and the full spec rides the
    * artifact meta so every admission, probe, and session replays it.
    * `bucketed = false` writes the plain directory layout — the
    * catalog-free fallback the parity specs compare against.
    */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String,
      shape: Shape = Shape.Corpus, bucketed: Boolean = true,
      buckets: Int = 0): Unit = {
    buildRuns.incrementAndGet()
    val carrier = carrierMeta(spark)
    require(bucketed || carrier.isEmpty,
      "manifest carrier needs the bucketed layout: the directory " +
        "layout's compact/purge re-read whole table DIRS, which a " +
        "manifest-carried table does not have")
    val shapeMeta = Map("bands" -> shape.bands.toString,
      "rowsPerBand" -> shape.rowsPerBand.toString,
      "slots" -> shape.slots.toString)
    if (!bucketed)
      artifact(indexDir).build(writeTables(docs, _, "overwrite", shape),
        buildMeta = shapeMeta)
    else {
      val family = IndexLayout.familyOf(indexDir)
      val per = DedupQueries.signaturesOf(docs, shape.slots).persist()
      try {
        // buckets = 0: size from bytes (Bucketing.indexBuckets — the
        // 32 MB index target with the parallelism floor) — the count
        // rides the persisted signature frame the writes reuse (never a
        // second scan of the source). Band rows are docs × bands at
        // ~16 B (bk, doc_id); signature rows carry the slots-wide
        // signature plus the distinct shingle hash set (~2 kB nominal).
        val rows = if (buckets > 0) 0L else per.count()
        val bandN = if (buckets > 0) buckets
          else Bucketing.indexBuckets(spark, rows * shape.bands * 16L)
        val sigN = if (buckets > 0) buckets
          else Bucketing.indexBuckets(spark,
            rows * (shape.slots * 8L + 2048L))
        val bands = bucketedBandFrame(per, shape)
        val meta = shapeMeta ++ carrier +
          (IndexLayout.LayoutKey -> IndexLayout.BucketedValue) ++
          IndexLayout.metaFor("signatures", IndexLayout.TableSpec(sigN,
            Seq("doc_id"), Seq("doc_id"), per.schema.toDDL)) ++
          IndexLayout.metaFor("bands", IndexLayout.TableSpec(bandN,
            Seq("bk"), Seq("bk"), bands.schema.toDDL))
        artifact(indexDir).build({ ver =>
          IndexLayout.writeInto(per, family, "signatures", ver,
            IndexLayout.specOf(meta, "signatures"), overwrite = true)
          IndexLayout.writeInto(bands, family, "bands", ver,
            IndexLayout.specOf(meta, "bands"), overwrite = true)
        }, buildMeta = meta)
      } finally { per.unpersist(); () }
    }
  }

  /** ADMIT a delta (probe-then-admit lifecycle): true if admitted, false
    * if `deltaId` was already applied. O(|delta|) write — previous files
    * carry as hard links, only the delta's part files are new. On the
    * bucketed layout: `signatures` appends at the modulus (≤ |delta|
    * touched buckets), `bands` as L0 accrual (≤ appendTasks files,
    * independent of the bucket count — [[writeTablesBucketed]]).
    * Signatures and bands at the shape the artifact records — never a
    * caller choice.
    */
  def append(spark: SparkSession, docs: DataFrame, indexDir: String,
      deltaId: String): Boolean = {
    val meta = artifact(indexDir).meta
    val shape = shapeOfMeta(meta)
    if (!IndexLayout.isBucketed(meta))
      artifact(indexDir).admit(deltaId, Tables,
        writeTables(docs, _, "append", shape))
    else {
      val family = IndexLayout.familyOf(indexDir)
      artifact(indexDir).admit(deltaId, Tables,
        writeTablesBucketed(family, docs, _, meta, shape))
    }
  }

  /** The delta's (bk, doc_id) band frame at the ARTIFACT's recorded
    * shape — measurement/observability hook (`FanoutProbe` counts the
    * buckets a delta's band rows touch).
    */
  private[graft] def deltaBandFrame(spark: SparkSession,
      indexDir: String, docs: DataFrame): DataFrame = {
    val shape = shapeOfMeta(artifact(indexDir).meta)
    bucketedBandFrame(DedupQueries.signaturesOf(docs, shape.slots), shape)
  }

  /** Drop index versions older than the newest `keep` (default 2: a
    * reader holding the previous version's paths — a lazy probe frame,
    * the ingest stream's cached corpus — survives one admission; consume
    * lazy frames before pruning deeper). On the bucketed layout the
    * pruned versions' external-table catalog entries drop with them
    * (metadata-only — the files are already gone).
    */
  def prune(spark: SparkSession, indexDir: String, keep: Int = 2): Unit = {
    val bucketed = IndexLayout.isBucketed(artifact(indexDir).meta)
    val dropped = artifact(indexDir).prune(keep)
    if (bucketed) {
      val family = IndexLayout.familyOf(indexDir)
      dropped.foreach(v =>
        Tables.foreach(IndexLayout.deregister(spark, family, _, v)))
      // manifest mounts are per-version metadata; drop them with the
      // version (symlinks never keep bytes alive, so order is free)
      dropped.foreach(IndexLayout.unmount(indexDir, _))
    }
  }

  /** Compact tables that accreted more than `maxFiles` part files across
    * admissions (measured in `IndexProbe`: 64 files PER admitted delta
    * on the directory layout; one per touched bucket per delta on the
    * bucketed layout) — out-of-band, behind the same atomic version swap
    * as admission, delta-idempotence carried. Directory bands re-cluster
    * on `band` so the probe's equi-join reads co-located buckets;
    * bucketed tables fold BUCKET-GRANULARLY (base file hard-links, only
    * the accrual rewrites — [[graft.streaming.VersionedArtifact
    * .compactBucketed]]) to a ≤ 2-files-per-bucket floor at the recorded
    * spec. Probe output is multiset-invariant across a compact
    * (`DedupIndexSpec`/`DedupIndexBucketedSpec`). Run from the admission
    * loop (single-writer contract).
    */
  def compact(spark: SparkSession, indexDir: String,
      maxFiles: Int = 64): Int = {
    val meta = artifact(indexDir).meta
    if (!IndexLayout.isBucketed(meta))
      artifact(indexDir).compact(Tables, maxFiles) { (src, tgt) =>
        val df = spark.read.parquet(src)
        val out =
          if (tgt.getName == "bands") df.repartition(col("band"))
          else df.repartition(col("doc_id"))
        out.write.mode("overwrite").parquet(tgt.toString)
      }
    else {
      val family = IndexLayout.familyOf(indexDir)
      // bucketed threshold = bucket floor + maxFiles ACCRUAL slack: the
      // compacted steady state is one or two files per bucket, so a flat
      // count would flag any table with > maxFiles buckets as permanently
      // fat. Bucket-granular rewrite: only the admission accrual is
      // folded (base files hard-link) — O(admitted bytes), not O(corpus)
      artifact(indexDir).compactBucketed(Tables,
        (t: String) => IndexLayout.specOf(meta, t).buckets + maxFiles) {
        (table, files, tgt) =>
          IndexLayout.writeInto(
            spark.read.parquet(files.map(_.getAbsolutePath): _*), family,
            table, tgt.getParentFile,
            IndexLayout.specOf(meta, table), overwrite = true)
      }
    }
  }

  /** LOGICAL document deletion (takedown) — admit `ids` (one LongType
    * doc-id column) into the artifact's tombstone sidecar under
    * `deltaId`; every subsequent probe drops pairs touching them. See
    * [[IndexTombstones]] for the two-phase design; false = the deltaId
    * was already applied (idempotent retry).
    */
  def delete(spark: SparkSession, indexDir: String, ids: DataFrame,
      deltaId: String): Boolean =
    IndexTombstones.delete(artifact(indexDir), Tables, ids, deltaId)

  /** [[delete]] for a batch of requests in ONE version bump — the
    * takedown-drain seat (see [[IndexTombstones.deleteAll]]).
    */
  def deleteAll(spark: SparkSession, indexDir: String,
      reqs: Seq[(DataFrame, String)]): Boolean =
    IndexTombstones.deleteAll(artifact(indexDir), Tables, reqs)

  /** |tombstones| / |indexed docs| for the current version — both
    * parquet row counts answered from footer metadata, no data read;
    * what the auto-purge policy compares to its threshold once per
    * takedown drain (never per batch). 0 with no sidecar.
    */
  def tombstoneRatio(spark: SparkSession, indexDir: String): Double =
    IndexTombstones.ratio(spark, artifact(indexDir), "signatures")

  /** PHYSICAL tombstone removal: rewrite both tables without the
    * tombstoned docs' rows and drop the sidecar, one pointer swap.
    * O(table) by design — the compliance backstop behind the logical
    * filter, not the hot path ([[IndexTombstones]]). False if there is
    * nothing to purge. `budget` > 0 slices the bucketed-layout purge at
    * ≤ budget buckets per call (the in-stream auto-purge's stall bound
    * — see [[graft.streaming.VersionedArtifact.purgeVersionBudgeted]]);
    * the directory layout always purges whole.
    */
  def purge(spark: SparkSession, indexDir: String,
      budget: Int = 0): Boolean = {
    val art = artifact(indexDir)
    IndexTombstones.loadTombstones(spark, art) match {
      case None => false
      case Some(t) =>
        val meta = art.meta
        val tomb = broadcast(t.select(col("id")))
        def kept(src: String): DataFrame = spark.read.parquet(src)
          .join(tomb, col("doc_id") === col("id"), "left_anti")
        if (!IndexLayout.isBucketed(meta))
          art.purgeVersion(Tables, Nil, Set(IndexTombstones.Table)) {
            (table, src, tgt) =>
              val out = if (table == "bands") kept(src).repartition(col("band"))
                else kept(src).repartition(col("doc_id"))
              out.write.mode("overwrite").parquet(tgt.toString)
          }
        else {
          val family = IndexLayout.familyOf(indexDir)
          // signatures is bucketed BY doc_id: only the buckets holding
          // tombstoned rows rewrite, the rest hard-link — O(affected
          // buckets), not O(table). bands (bucketed by the band key)
          // rewrites whole: a deleted doc's band rows spread across all
          // buckets by construction.
          def affectedOf(table: String): Option[Set[String]] = {
            val spec = IndexLayout.specOf(meta, table)
            if (spec.by != Seq("doc_id")) None
            else Some(IndexTombstones.affectedBuckets(t, spec.buckets))
          }
          art.purgeVersionBudgeted(Tables, Nil,
              Set(IndexTombstones.Table), affectedOf, budget) {
            (table, files, tgt) =>
              IndexLayout.writeInto(
                spark.read.parquet(files.map(_.getAbsolutePath): _*)
                  .join(tomb, col("doc_id") === col("id"), "left_anti"),
                family, table, tgt.getParentFile,
                IndexLayout.specOf(meta, table), overwrite = true)
          }
          ()
        }
        true
    }
  }

  /** Whether a budget-sliced [[purge]] is mid-flight — polled per batch
    * by the maintenance seat (see `IngestDedup.maintain`).
    */
  def purgePending(indexDir: String): Boolean =
    artifact(indexDir).purgePending

  /** Probe the index with a `(doc_id, text)` delta frame: verified
    * near-dup pairs (corpus_id, new_id, jaccard ≥ 0.8) between the delta
    * and the indexed corpus. Cost is O(|delta| + matches) — nothing
    * corpus-sized is computed, only scanned through the equi-join (and
    * on the bucketed layout the corpus side is never even shuffled).
    * Both artifact tables resolve against ONE pointer read, so a
    * concurrent admission cannot hand the verify a different version
    * than the candidate join.
    */
  def probe(spark: SparkSession, indexDir: String,
      deltaDocs: DataFrame): DataFrame =
    probeLoaded(load(spark, indexDir), deltaDocs)

  /** The artifact's tables + shape resolved against ONE pointer read —
    * what a LONG-LIVED prober (the streaming text-ingest face) loads
    * once and persists, so every micro-batch probes memory instead of
    * re-reading (or worse, re-deriving) corpus-sized state. `bucketed`
    * records which layout (and therefore which probe plan) the frames
    * carry.
    */
  final case class Loaded(signatures: DataFrame, bands: DataFrame,
      shape: Shape, bucketed: Boolean = false,
      private[graft] val buckets: Map[String, Int] = Map.empty,
      private[graft] val tombstones: Option[DataFrame] = None,
      private[graft] val l0Bands: Option[DataFrame] = None) {

    /** Every L0 frame present — what the streaming cache persists next
      * to the base frames (delta-sized; pinning them is cheaper than
      * one lake read per batch).
      */
    private[graft] def l0Frames: Seq[DataFrame] = l0Bands.toSeq
  }

  /** Artifact-load counter — see [[SrpIndex.loadRuns]]. */
  val loadRuns = new java.util.concurrent.atomic.AtomicLong(0)

  def load(spark: SparkSession, indexDir: String): Loaded = {
    loadRuns.incrementAndGet()
    val art = artifact(indexDir)
    if (art.isManifestCurrent) {
      // MANIFEST carrier: tables resolve as logical FILE lists (physical
      // + carried references — a dir read would silently miss every
      // carried file), then MOUNT as per-version symlink trees and
      // register as the SAME external bucketed tables the link carrier
      // gets ([[IndexLayout.mountManifest]] — the local stand-in for the
      // table format's metadata layer at an object-store deployment).
      // Probe plans are therefore carrier-IDENTICAL: bucket
      // HashPartitioning reported (corpus side never re-shuffles — the
      // r20 verdict's #1 scale gap), SelectedBucketsCount pruning
      // available, L0 accrual read as its own delta-sized leg. Same
      // one-pointer-read contract as the link branch.
      val snap = art.snapshotLogical(Tables, IndexTombstones.Table)
      val meta = snap.meta
      val family = IndexLayout.familyOf(indexDir)
      def mounted(t: String): File = IndexLayout.mountManifest(
        indexDir, t, snap.version, snap.tableFiles(t))
      def tbl(t: String): DataFrame = spark.table(IndexLayout.register(
        spark, family, t, mounted(t), IndexLayout.specOf(meta, t)))
      val bandsDir = mounted("bands")
      return Loaded(tbl("signatures"), tbl("bands"), shapeOfMeta(meta),
        bucketed = IndexLayout.isBucketed(meta),
        buckets = Tables.map(t =>
          t -> IndexLayout.specOf(meta, t).buckets).toMap,
        tombstones = IndexTombstones.fromFiles(spark, snap.extraFiles),
        l0Bands = IndexLayout.l0Frame(spark, bandsDir.toString))
    }
    // shape, layout, table paths, AND the tombstone sidecar all resolve
    // against ONE pointer read: independent reads could straddle a
    // purge and pair pre-purge tables with a dropped sidecar —
    // transiently resurfacing deleted pairs
    val snap = artifact(indexDir).snapshot(Tables, IndexTombstones.Table)
    val meta = snap.meta
    val shape = shapeOfMeta(meta)
    val paths = snap.paths
    val tomb = IndexTombstones.fromSnapshot(spark, snap)
    if (!IndexLayout.isBucketed(meta))
      Loaded(spark.read.parquet(paths("signatures")),
        spark.read.parquet(paths("bands")), shape, tombstones = tomb)
    else {
      val family = IndexLayout.familyOf(indexDir)
      def tbl(t: String): DataFrame = spark.table(IndexLayout.register(
        spark, family, t, new File(paths(t)), IndexLayout.specOf(meta, t)))
      Loaded(tbl("signatures"), tbl("bands"), shape, bucketed = true,
        buckets = Tables.map(t =>
          t -> IndexLayout.specOf(meta, t).buckets).toMap,
        tombstones = tomb,
        l0Bands = IndexLayout.l0Frame(spark, paths("bands")))
    }
  }

  /** Total data bytes behind the artifact's current version — what the
    * streaming face's cache-if-fits decision reads once per version.
    */
  def artifactBytes(indexDir: String): Long = artifact(indexDir).currentBytes

  /** [[probe]] against pre-loaded (possibly persisted) artifact frames.
    *
    * `micro = true` declares `deltaDocs` a MICRO-BATCH (the streaming
    * ingest face): delta bands and candidates broadcast into the corpus
    * joins, so the corpus band/signature tables STREAM with zero
    * per-batch exchange — see [[ContainIndex.probeLoaded]]. On the
    * BUCKETED layout the corpus-side READ picks one of three regimes
    * (the r15 design — each measured in `IngestProbe`/SCALE.md):
    *
    *   1. CACHED — the frames are persisted ([[IndexLayout.isCached]];
    *      the streaming face persists them whenever the artifact fits
    *      the cluster's storage budget, see `IngestDedup`): the lazy
    *      broadcast-delta plan streams the InMemoryRelation, nothing
    *      read from the lake. The steady state below cache scale.
    *   2. UNCACHED, PRUNABLE (the 100 TB regime: the artifact outgrew
    *      memory, and the byte-sized bucket counts dwarf the delta's
    *      key set): eager through candidate generation — the delta's
    *      band rows collect (|batch| × bands, admission-bounded), the
    *      corpus band scan BUCKET-PRUNES to their key set, candidates
    *      localize, and the verify's corpus signature scan prunes to
    *      the matched ids — every corpus read a pruned bucket read
    *      (`SelectedBucketsCount` k out of n), nothing corpus-sized.
    *   3. UNCACHED, UNPRUNABLE (keys ≥ bucket count — toy-scale tables
    *      or oversized batches): [[IndexLayout.pruned]] declines the
    *      INSET per table, leaving the same eager plan over parallel
    *      full bucketed scans — the honest fallback; the verify side
    *      still prunes to candidate ids (always a small set).
    *
    * Batch probes (`micro = false`) stay fully lazy.
    */
  def probeLoaded(loaded: Loaded, deltaDocs: DataFrame,
      micro: Boolean = false): DataFrame = {
    val spark = deltaDocs.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val shape = loaded.shape
    // no persist: the probe returns a LAZY frame, and a persist here with
    // no unpersist would pin a cache entry per daily probe for the life
    // of the ingest session; the delta-sized recompute across the frame's
    // few consumers is cheaper than that leak
    val deltaPer = DedupQueries.signaturesOf(deltaDocs, shape.slots)
    // id_a =!= id_b: a RE-probe after admission (the at-least-once retry
    // the deltaId-idempotent admit exists for) would otherwise match every
    // delta doc against its own admitted copy at jaccard 1.0 and report
    // the whole retried delta as corpus duplicates — a keeper policy
    // downstream would then drop it. Batch faces filter the same way.
    val (cand, corpusSigs) =
      if (!loaded.bucketed) {
        val corpusBands = loaded.bands.withColumnRenamed("doc_id", "id_a")
        val deltaBands = bandFrame(deltaPer, shape)
          .withColumnRenamed("doc_id", "id_b")
        val deltaSide = if (micro) broadcast(deltaBands) else deltaBands
        (deltaSide.join(corpusBands, Seq("band", "sig"))
          .where(col("id_a") =!= col("id_b"))
          .select(col("id_a"), col("id_b")).distinct(), loaded.signatures)
      } else if (!micro || IndexLayout.isCached(loaded.bands)) {
        // batch probe, or the micro CACHED regime (1): lazy bk
        // equi-join; micro broadcasts the delta so the corpus side
        // (bucketed scan or InMemoryRelation) streams exchange-free.
        // L0 leg: join the bucketed BASE and the delta-sized L0 accrual
        // SEPARATELY and union RESULTS — unioning the inputs would
        // erase the base table's bucket partitioning (see
        // ContainIndex.probeRaw's overCorpus); a corpus doc's band rows
        // live wholly in one leg (admissions land whole in L0,
        // compaction folds all of L0 at once), and the distinct after
        // the union collapses duplicates either way
        val deltaBands = bucketedBandFrame(deltaPer, shape)
          .withColumnRenamed("doc_id", "id_b")
        val deltaSide = if (micro) broadcast(deltaBands) else deltaBands
        def leg(c: DataFrame): DataFrame =
          deltaSide.join(c.withColumnRenamed("doc_id", "id_a"), Seq("bk"))
            .where(col("id_a") =!= col("id_b"))
            .select(col("id_a"), col("id_b"))
        (loaded.l0Bands.fold(leg(loaded.bands))(d =>
          leg(loaded.bands).unionByName(leg(d))).distinct(),
          loaded.signatures)
      } else {
        // uncached micro, regimes (2)/(3): ONE eager candidate job
        // ([[microCandidates]] — corpus band read pruned where the key
        // count clears the table's bucket count, full parallel scan
        // where it doesn't), then the candidate pairs LOCALIZE (they
        // are the broadcast size class already) so the verify's corpus
        // signature scan can bucket-prune to the matched ids.
        import spark.implicits._
        val candRows = microCandidates(loaded, deltaPer)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        (candRows.toDF("id_a", "id_b"),
          IndexLayout.pruned(loaded.signatures, "doc_id",
            candRows.map(_._1).distinct,
            loaded.buckets.getOrElse("signatures", Int.MaxValue)))
      }
    IndexTombstones.filterPairs(
      DedupQueries.verifyJaccardSplit(corpusSigs, deltaPer, cand, 0.8,
          micro)
        .select(col("id_a").as("corpus_id"), col("id_b").as("new_id"),
          col("jaccard")),
      loaded.tombstones, "corpus_id", "new_id")
  }

  /** The bucketed micro probe's candidate frame, LAZY — the one plan
    * that touches the corpus band table per micro batch: the delta's
    * band rows collect (|batch| × bands — admission-bounded by the
    * stream's contract) and come back as a broadcast local relation, and
    * the corpus band scan BUCKET-PRUNES to their key set
    * (`SelectedBucketsCount` k out of n; `DedupIndexBucketedSpec` pins
    * the shape). [[probeLoaded]] collects it; exposed so the plan spec
    * can assert the pruning on the frame itself.
    */
  private[graft] def microCandidates(loaded: Loaded,
      deltaPer: DataFrame): DataFrame = {
    val spark = deltaPer.sparkSession
    import spark.implicits._
    val deltaBandRows = bucketedBandFrame(deltaPer, loaded.shape)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val deltaSide = broadcast(deltaBandRows.toDF("bk", "id_b"))
    // L0 leg (see probeLoaded): the base scan keeps its INSET bucket
    // pruning; the L0 files are delta-sized and scan whole — the
    // equi-join restricts them the same way
    val base = IndexLayout.pruned(
      loaded.bands.withColumnRenamed("doc_id", "id_a"), "bk",
      deltaBandRows.map(_._1).distinct,
      loaded.buckets.getOrElse("bands", Int.MaxValue))
    def leg(c: DataFrame): DataFrame =
      deltaSide.join(c, Seq("bk"))
        .where(col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b"))
    loaded.l0Bands.fold(leg(base))(d =>
      leg(base).unionByName(leg(d.withColumnRenamed("doc_id", "id_a"))))
      .distinct()
  }
}
