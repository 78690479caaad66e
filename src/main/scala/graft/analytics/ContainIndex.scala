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
  *
  * TWO LAYOUTS, ONE FAMILY (see [[DedupIndex]]'s class doc for the full
  * design): the plain directory layout, or the BUCKETED layout
  * (`build(…, bucketed = true)`, the corpus-scale default) — the same
  * four tables written as [[IndexLayout]] external bucketed tables
  * inside the version dirs: `tokens`/`prefix`/`df` bucketBy the token
  * hash `hx` (this family's keys are single-column already, so no
  * derived key is needed), `sets` bucketBy `doc_id`. Probes read every
  * corpus table in place (only delta frames and candidates exchange —
  * `ContainIndexBucketedSpec`), micro probes BUCKET-PRUNE the postings
  * and df scans to the delta's token set, and admission/compaction
  * preserve the layout.
  */
object ContainIndex {

  private val Tables = Seq("tokens", "prefix", "sets", "df")

  /** Distinct-token ceiling for [[append]]'s broadcast df-shrink: 4 M
    * 8-byte hashes ≈ 32 MB on the wire (plus the shrunk df rows they
    * key, the same order) — comfortably inside Spark's broadcast limits
    * with headroom, far past any micro-batch. Above it the shrink joins
    * shuffle instead of broadcasting.
    */
  private val MaxBroadcastTokens = 1L << 22

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
    * corpus frame. The BUCKETED layout is the DEFAULT (byte-sized counts
    * unless `buckets` pins them, full spec recorded in the artifact
    * meta — see [[DedupIndex.build]]); `bucketed = false` writes the
    * plain directory layout the parity specs compare against.
    */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String,
      bucketed: Boolean = true, buckets: Int = 0): Unit = {
    buildRuns.incrementAndGet()
    // carrier conf, same contract as DedupIndex.build (bucketed-only)
    val carrier = DedupIndex.carrierMetaOf(spark)
    require(bucketed || carrier.isEmpty,
      "manifest carrier needs the bucketed layout (see DedupIndex.build)")
    if (!bucketed)
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
    else {
      val family = IndexLayout.familyOf(indexDir)
      val sh = shingled(docs).persist()
      val dfFrame = sh.groupBy(col("hx")).agg(count(lit(1)).as("df"))
        .persist()
      try {
        // buckets = 0: per-table sizing from bytes (Bucketing
        // .indexBuckets — 32 MB index target, parallelism floor),
        // counted on the persisted frames the writes reuse. tokens = the
        // full posting list at ~16 B/row; prefix ≈ 1/10 of it; df = one
        // row per DISTINCT token; sets pack the same hashes as tokens at
        // ~8 B plus per-doc framing
        val shRows = if (buckets > 0) 0L else sh.count()
        val dfRows = if (buckets > 0) 0L else dfFrame.count()
        def n(bytes: Long): Int =
          if (buckets > 0) buckets
          else Bucketing.indexBuckets(spark, bytes)
        val postings = Map(
          "tokens" -> n(shRows * 16L), "prefix" -> n(shRows * 16L / 10),
          "df" -> n(dfRows * 16L))
        // schema DDLs: postings tables are (hx, doc_id); df is (hx, df);
        // sets is setsOf's (doc_id, hs, sz). Derived from the actual
        // frame (metadata-only), like every other table's spec — a
        // caller-supplied non-Long doc_id must register as what the
        // files really hold, or cross-session re-registration reads wrong
        val postingDDL = DedupQueries.containRanked(sh, dfFrame)
          .select(col("hx"), col("doc_id")).schema.toDDL
        val meta = carrier ++ Map(
          IndexLayout.LayoutKey -> IndexLayout.BucketedValue) ++
          IndexLayout.metaFor("tokens", IndexLayout.TableSpec(
            postings("tokens"), Seq("hx"), Seq("hx"), postingDDL)) ++
          IndexLayout.metaFor("prefix", IndexLayout.TableSpec(
            postings("prefix"), Seq("hx"), Seq("hx"), postingDDL)) ++
          IndexLayout.metaFor("df", IndexLayout.TableSpec(
            postings("df"), Seq("hx"), Seq("hx"),
            dfFrame.schema.toDDL)) ++
          IndexLayout.metaFor("sets", IndexLayout.TableSpec(
            n(shRows * 9L), Seq("doc_id"), Seq("doc_id"),
            setsOf(sh).schema.toDDL))
        artifact(indexDir).build({ next =>
          writeBucketed(family, sh, dfFrame, next, meta)
        }, buildMeta = meta)
      } finally { sh.unpersist(); dfFrame.unpersist(); () }
    }
  }

  /** The bucketed-layout BUILD write of all four tables (fresh df).
    * Admissions no longer route here — they append `sets` at the bucket
    * modulus and write `tokens`/`prefix` as L0 accrual ([[append]]).
    */
  private def writeBucketed(family: String, sh: DataFrame,
      dfForRank: DataFrame, ver: File, meta: Map[String, String]): Unit = {
    val r = DedupQueries.containRanked(sh, dfForRank)
    IndexLayout.writeInto(dfForRank, family, "df", ver,
      IndexLayout.specOf(meta, "df"), overwrite = true)
    IndexLayout.writeInto(r.select(col("hx"), col("doc_id")), family,
      "tokens", ver, IndexLayout.specOf(meta, "tokens"), overwrite = true)
    IndexLayout.writeInto(
      DedupQueries.containPrefix(r).select(col("hx"), col("doc_id")),
      family, "prefix", ver, IndexLayout.specOf(meta, "prefix"),
      overwrite = true)
    IndexLayout.writeInto(setsOf(sh), family, "sets", ver,
      IndexLayout.specOf(meta, "sets"), overwrite = true)
  }

  /** ADMIT a delta (probe-then-admit lifecycle): true if admitted, false
    * if `deltaId` was already applied. The delta's prefixes are ranked
    * by the FROZEN corpus df (unseen tokens rarest) and df is NOT
    * rewritten — safe by the pigeonhole's order-independence, and
    * precisely what keeps admission O(|delta|): a df rewrite would be a
    * corpus-sized job on every ingest. Re-freshen df with a periodic
    * [[build]] when probe cost drifts.
    *
    * WRITE SHAPE (bucketed layout) — L0 ACCRUAL, the standard
    * LSM/lakehouse trade: `tokens`/`prefix` delta rows land as a fixed
    * handful of UNBUCKETED parquet files under the table's `_l0` subdir
    * (`spark.graft.index.append.tasks` files each, default 8 —
    * underscore dirs are invisible to the registered bucketed table, so
    * the base files' bucket contract holds), and `sets` appends at the
    * bucket modulus (its rows touch ≤ |delta| buckets — already
    * delta-bounded). Per-admission file count is therefore independent
    * of the corpus's bucket count — the pre-r18 bucketed append wrote
    * one file per touched bucket per table (~3 × buckets ≈ 192
    * files/batch at the 100× rehearsal's 64 buckets, and the admission
    * bottleneck at a 100 TB deployment's thousands of buckets). Probes
    * read L0 as a separate delta-sized leg unioned AFTER the base joins
    * (base pruning intact — see `probeRaw.overCorpus`);
    * `compactBucketed` counts L0 toward the accrual threshold and folds
    * it into the buckets, so `compactEvery` bounds the L0 leg's size.
    */
  def append(spark: SparkSession, docs: DataFrame, indexDir: String,
      deltaId: String): Boolean = {
    val art = artifact(indexDir)
    val meta = art.meta
    // frozen corpus df, carrier-aware: a manifest artifact's df is
    // partly (or wholly) carried references with no physical dir
    def corpusDfFrame(): DataFrame =
      if (art.isManifestCurrent)
        spark.read.parquet(
          art.snapshotLogical(Seq("df"), IndexTombstones.Table)
            .tableFiles("df").map(_._2.getAbsolutePath): _*)
      else spark.read.parquet(art.tablePath("df"))
    // rank against the DELTA-SHRUNK frozen df — the same trick the
    // micro probe uses (`probeRaw`'s dfForRank): containRanked's left
    // join cannot broadcast its preserved side, so handing it the full
    // df table exchange+sorts the corpus's token statistics on EVERY
    // admission — at the 100× rehearsal's 60 M-row (498 MB) df that was
    // 16.7 s per pass, twice per append (tokens + prefix both derive
    // from r). Shrinking first makes df STREAM once against the
    // broadcast token set; the shrunk frame is delta-bounded and itself
    // broadcastable. Semantically a no-op: the left join only ever
    // matches the delta's own tokens, and unseen tokens coalesce to
    // df 0 (rarest) either way.
    // The hints are GATED on the delta's distinct-token count: admission
    // deltas are micro-batches by contract, but append is also a public
    // batch API, and a large delta's token set (or the shrunk df it keys)
    // can exceed the broadcast/driver limit — past the gate both joins
    // fall back to shuffles, trading the per-admission speedup for an
    // admission that still completes. The count is one delta-sized job
    // against the caller-persisted shingle frame.
    def shrunk(sh: DataFrame): DataFrame = {
      val toks = sh.select(col("hx")).distinct()
      val corpusDf = corpusDfFrame()
      if (toks.count() <= MaxBroadcastTokens)
        broadcast(corpusDf.join(broadcast(toks), "hx"))
      else corpusDf.join(toks, "hx")
    }
    if (!IndexLayout.isBucketed(meta))
      artifact(indexDir).admit(deltaId, Tables, { next =>
        val sh = shingled(docs).persist()
        try
          writePostings(DedupQueries.containRanked(sh, shrunk(sh)), sh,
            next, "append")
        finally { sh.unpersist(); () }
      })
    else {
      val family = IndexLayout.familyOf(indexDir)
      artifact(indexDir).admit(deltaId, Tables, { next =>
        val sh = shingled(docs).persist()
        try {
          // frozen corpus df, read as plain parquet from the snapshot
          // path (bucket metadata is a read-side catalog concern; the
          // files are ordinary parquet) — df itself is NOT rewritten,
          // same frozen-df contract as the directory admit. r is
          // DELTA-sized — persist it so tokens and prefix don't each
          // re-pay the df-rank scan (two corpus-df passes per
          // admission, 2 × 16.7 s at the 100× rehearsal's 60 M-row df)
          val r = DedupQueries.containRanked(sh, shrunk(sh))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            IndexLayout.fanoutAppend(r.select(col("hx"), col("doc_id")),
              family, "tokens", next, IndexLayout.specOf(meta, "tokens"))
            IndexLayout.fanoutAppend(DedupQueries.containPrefix(r)
              .select(col("hx"), col("doc_id")), family, "prefix", next,
              IndexLayout.specOf(meta, "prefix"))
            IndexLayout.writeInto(setsOf(sh), family, "sets", next,
              IndexLayout.specOf(meta, "sets"), overwrite = false)
          } finally { r.unpersist(); () }
        } finally { sh.unpersist(); () }
      })
    }
  }

  /** Drop index versions older than the newest `keep` (default 2 — see
    * [[DedupIndex.prune]]'s reader-grace + catalog-drop notes).
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

  /** Compact tables past `maxFiles` part files — see
    * [[DedupIndex.compact]] (same versioned-swap transaction, same
    * multiset invariance, spec-pinned in `ContainIndexSpec`). Postings
    * re-cluster on the token hash (the probes' equi-join key), sets on
    * doc_id.
    */
  def compact(spark: SparkSession, indexDir: String,
      maxFiles: Int = 64): Int = {
    val meta = artifact(indexDir).meta
    if (!IndexLayout.isBucketed(meta))
      artifact(indexDir).compact(Tables, maxFiles) { (src, tgt) =>
        val df = spark.read.parquet(src)
        val out =
          if (tgt.getName == "sets") df.repartition(col("doc_id"))
          else df.repartition(col("hx"))
        out.write.mode("overwrite").parquet(tgt.toString)
      }
    else {
      val family = IndexLayout.familyOf(indexDir)
      // bucketed threshold = bucket floor + maxFiles ACCRUAL slack; the
      // rewrite is bucket-granular (fold the accrual, hard-link the base
      // files) — see DedupIndex.compact and VersionedArtifact
      // .compactBucketed
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

  /** LOGICAL document deletion (takedown) — see [[DedupIndex.delete]] /
    * [[IndexTombstones]]: `ids` is one LongType doc-id column; probes
    * drop pairs touching the set; false = deltaId already applied.
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

  /** |tombstones| / |indexed docs| — the auto-purge trigger metric;
    * see [[IndexTombstones.ratio]]. `sets` is the one-row-per-doc
    * table.
    */
  def tombstoneRatio(spark: SparkSession, indexDir: String): Double =
    IndexTombstones.ratio(spark, artifact(indexDir), "sets")

  /** PHYSICAL tombstone removal — see [[DedupIndex.purge]]. The `df`
    * table carries as a LINK, not a rewrite: it has no doc-id column
    * (token → document frequency), and a deleted doc's contribution is
    * an efficiency-only drift by the prefix filter's order-independence
    * — the same frozen-df argument [[append]] rests on. Re-freshen with
    * a periodic [[build]].
    *
    * `budget` > 0 slices the purge at ≤ budget buckets per call (see
    * [[graft.streaming.VersionedArtifact.purgeVersionBudgeted]]) —
    * THIS face is why the budget exists: `tokens`/`prefix` are
    * token-keyed and rewrite whole, the O(corpus-table) pause that
    * stalled the admitting stream at the 100× rehearsal. Bucketed
    * layout only; the plain directory layout (parity fallback, never
    * the corpus-scale path) always purges in one call.
    */
  def purge(spark: SparkSession, indexDir: String,
      budget: Int = 0): Boolean = {
    val art = artifact(indexDir)
    IndexTombstones.loadTombstones(spark, art) match {
      case None => false
      case Some(t) =>
        val meta = art.meta
        val rewriteTables = Tables.filterNot(_ == "df")
        val tomb = broadcast(t.select(col("id")))
        def kept(src: String): DataFrame = spark.read.parquet(src)
          .join(tomb, col("doc_id") === col("id"), "left_anti")
        if (!IndexLayout.isBucketed(meta))
          art.purgeVersion(rewriteTables, Seq("df"),
              Set(IndexTombstones.Table)) { (table, src, tgt) =>
            val out = if (table == "sets") kept(src).repartition(col("doc_id"))
              else kept(src).repartition(col("hx"))
            out.write.mode("overwrite").parquet(tgt.toString)
          }
        else {
          val family = IndexLayout.familyOf(indexDir)
          // sets is bucketed BY doc_id: affected-bucket rewrite only
          // (see DedupIndex.purge); tokens/prefix (bucketed by the
          // token hash) rewrite whole
          def affectedOf(table: String): Option[Set[String]] = {
            val spec = IndexLayout.specOf(meta, table)
            if (spec.by != Seq("doc_id")) None
            else Some(IndexTombstones.affectedBuckets(t, spec.buckets))
          }
          art.purgeVersionBudgeted(rewriteTables, Seq("df"),
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

  /** Whether a budget-sliced [[purge]] is mid-flight — what the
    * maintenance seat polls per batch so a started purge runs to
    * completion (see `IngestDedup.maintain`).
    */
  def purgePending(indexDir: String): Boolean =
    artifact(indexDir).purgePending

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
      sets: DataFrame, df: DataFrame, bucketed: Boolean = false,
      private[graft] val buckets: Map[String, Int] = Map.empty,
      private[graft] val tombstones: Option[DataFrame] = None,
      private[graft] val l0Tokens: Option[DataFrame] = None,
      private[graft] val l0Prefix: Option[DataFrame] = None) {

    /** Every L0 frame present — what the streaming cache persists next
      * to the base frames (delta-sized; pinning them is cheaper than
      * one lake read per batch).
      */
    private[graft] def l0Frames: Seq[DataFrame] =
      l0Tokens.toSeq ++ l0Prefix.toSeq
  }

  /** Artifact-load counter — see [[SrpIndex.loadRuns]]. */
  val loadRuns = new java.util.concurrent.atomic.AtomicLong(0)

  def load(spark: SparkSession, indexDir: String): Loaded = {
    loadRuns.incrementAndGet()
    val art = artifact(indexDir)
    if (art.isManifestCurrent) {
      // MANIFEST carrier: logical file lists MOUNTED and registered as
      // the same external bucketed tables the link carrier gets — see
      // DedupIndex.load's manifest branch and
      // IndexLayout.mountManifest for the full rationale. Probe plans
      // are carrier-identical (in-place corpus scans, L0 legs).
      val snap = art.snapshotLogical(Tables, IndexTombstones.Table)
      val meta = snap.meta
      val family = IndexLayout.familyOf(indexDir)
      def mounted(t: String): File = IndexLayout.mountManifest(
        indexDir, t, snap.version, snap.tableFiles(t))
      def tbl(t: String): DataFrame = spark.table(IndexLayout.register(
        spark, family, t, mounted(t), IndexLayout.specOf(meta, t)))
      return Loaded(tbl("tokens"), tbl("prefix"), tbl("sets"),
        tbl("df"), bucketed = IndexLayout.isBucketed(meta),
        buckets = Tables.map(t =>
          t -> IndexLayout.specOf(meta, t).buckets).toMap,
        tombstones = IndexTombstones.fromFiles(spark, snap.extraFiles),
        l0Tokens = IndexLayout.l0Frame(spark, mounted("tokens").toString),
        l0Prefix = IndexLayout.l0Frame(spark, mounted("prefix").toString))
    }
    // one pointer read for meta + table paths + sidecar: independent
    // reads could straddle a purge and serve pre-purge tables unfiltered
    val snap = artifact(indexDir).snapshot(Tables, IndexTombstones.Table)
    val meta = snap.meta
    val paths = snap.paths
    val tomb = IndexTombstones.fromSnapshot(spark, snap)
    if (!IndexLayout.isBucketed(meta))
      Loaded(spark.read.parquet(paths("tokens")),
        spark.read.parquet(paths("prefix")),
        spark.read.parquet(paths("sets")),
        spark.read.parquet(paths("df")), tombstones = tomb)
    else {
      val family = IndexLayout.familyOf(indexDir)
      def tbl(t: String): DataFrame = spark.table(IndexLayout.register(
        spark, family, t, new File(paths(t)), IndexLayout.specOf(meta, t)))
      // L0 accrual: admission appends live as plain parquet under the
      // table's `_l0` subdir (see [[IndexLayout.l0Append]]); probes
      // read them as a separate delta-sized leg ([[probeLoaded]]) until
      // compaction folds them into buckets
      Loaded(tbl("tokens"), tbl("prefix"), tbl("sets"), tbl("df"),
        bucketed = true,
        buckets = Tables.map(t =>
          t -> IndexLayout.specOf(meta, t).buckets).toMap,
        tombstones = tomb,
        l0Tokens = IndexLayout.l0Frame(spark, paths("tokens")),
        l0Prefix = IndexLayout.l0Frame(spark, paths("prefix")))
    }
  }

  /** Total data bytes behind the artifact's current version — what the
    * streaming face's cache-if-fits decision reads once per version.
    */
  def artifactBytes(indexDir: String): Long = artifact(indexDir).currentBytes

  /** [[probe]] against pre-loaded (possibly persisted) artifact frames.
    *
    * `micro = true` declares `deltaDocs` a MICRO-BATCH (the streaming
    * ingest face, where admission control bounds the delta per trigger):
    * delta-derived sides broadcast into every corpus join, so the cached
    * corpus tables STREAM — no per-batch exchange or sort of
    * corpus-sized postings (the dominant per-batch term at 10× corpus,
    * measured in `IngestProbe`). Batch probes keep the default: a daily
    * delta is not broadcast-bounded.
    *
    * On the BUCKETED layout, an UNCACHED micro probe goes further
    * ([[DedupIndex.probeLoaded]]'s three-regime design — a CACHED one,
    * the steady state whenever the artifact fits the cluster's storage
    * budget, takes the broadcast-delta plan below over the
    * InMemoryRelations): the delta's distinct token hashes collect
    * (CAPPED — see [[microCandidateFrames]]) and BUCKET-PRUNE the
    * `tokens`/`prefix`/`df` scans where the key count clears the
    * table's bucket count; the per-direction candidate pairs then
    * localize and the corpus `sets` scans bucket-prune to the candidate
    * ids. Eager through candidate generation; batch probes stay fully
    * lazy.
    */
  def probeLoaded(loaded: Loaded, deltaDocs: DataFrame,
      micro: Boolean = false): DataFrame =
    IndexTombstones.filterPairs(
      probeRaw(loaded, deltaDocs, micro), loaded.tombstones, "id_a", "id_b")

  private def probeRaw(loaded: Loaded, deltaDocs: DataFrame,
      micro: Boolean): DataFrame = {
    val spark = deltaDocs.sparkSession
    graft.functions.VectorFunctions.register(spark)
    // no persist — see DedupIndex.probe: a lazy return plus an
    // un-released cache entry per daily probe is a session-length leak
    val sh = shingled(deltaDocs)
    val deltaSets = setsOf(sh)
    val corpusSets = loaded.sets
    if (micro && loaded.bucketed && !IndexLayout.isCached(loaded.tokens)) {
      // TWO eager candidate jobs (one per direction, each reading its
      // corpus posting table once — pruned where the delta's key count
      // clears the table's bucket count), candidates localized, corpus
      // `sets` scans bucket-pruned per direction to the candidate ids.
      // The delta's shingle frame persists for the eager window (the hx
      // limit-collect plus both candidate collects would otherwise each
      // re-derive it) and releases before the lazy return — the verify
      // pays ONE delta-sized recompute at the sink, same contract as
      // every micro face. Split verify as below: each side unique by
      // construction, the final distinct collapses the one overlap a
      // RE-probe can produce.
      import spark.implicits._
      val setsN = loaded.buckets.getOrElse("sets", Int.MaxValue)
      val shP = sh.persist()
      val (n2o, o2n) =
        try {
          val (n2oF, o2nF) = microCandidateFramesOf(loaded, shP)
          (n2oF.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq,
            o2nF.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
        } finally { shP.unpersist(); () }
      return DedupQueries.verifyContainmentSplit(deltaSets,
          IndexLayout.pruned(corpusSets, "doc_id", n2o.map(_._2).distinct,
            setsN),
          n2o.toDF("id_a", "id_b"), micro = true)
        .unionByName(DedupQueries.verifyContainmentSplit(
          IndexLayout.pruned(corpusSets, "doc_id", o2n.map(_._1).distinct,
            setsN),
          deltaSets, o2n.toDF("id_a", "id_b"), micro = true))
        .distinct()
    }
    // micro: containRanked's left join would exchange+sort the corpus df
    // table per batch (left-outer can't broadcast its preserved side);
    // shrink df to the delta's tokens first — corpus df STREAMS against
    // the broadcast token set, and the left join downstream is
    // delta×delta (unseen tokens still coalesce to df 0 = rarest)
    val dfForRank =
      if (micro)
        // outer broadcast: containRanked's LEFT join can then take this
        // delta-bounded frame as its broadcast build side too
        broadcast(loaded.df
          .join(broadcast(sh.select(col("hx")).distinct()), "hx"))
      else loaded.df
    val r = DedupQueries.containRanked(sh, dfForRank)
    def side(d: DataFrame): DataFrame = if (micro) broadcast(d) else d
    val deltaPrefix = DedupQueries.containPrefix(r)
      .select(col("hx"), col("doc_id"))
    val deltaTokens = r.select(col("hx"), col("doc_id"))
    // L0 leg: candidates join the bucketed BASE and the delta-sized L0
    // accrual SEPARATELY and union RESULTS — unioning the inputs would
    // erase the base table's bucket partitioning (and with it the
    // in-place batch joins and the micro probes' bucket pruning) for
    // the price of a few small files. A corpus doc's postings live
    // wholly in one leg (admissions append whole docs to L0; compaction
    // folds all of L0 at once), so the union introduces no cross-leg
    // duplicate pairs; the existing per-direction distincts are
    // unchanged either way.
    def overCorpus(base: DataFrame, l0: Option[DataFrame])(
        leg: DataFrame => DataFrame): DataFrame =
      l0.fold(leg(base))(d => leg(base).unionByName(leg(d)))
    val rawNewInOld = overCorpus(loaded.tokens, loaded.l0Tokens) { c =>
      side(deltaPrefix.withColumnRenamed("doc_id", "id_a"))
        .join(c.withColumnRenamed("doc_id", "id_b"), "hx")
        .where(col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b"))
    }
    val rawOldInNew = overCorpus(loaded.prefix, loaded.l0Prefix) { c =>
      c.withColumnRenamed("doc_id", "id_a")
        .join(side(deltaTokens.withColumnRenamed("doc_id", "id_b")), "hx")
        .where(col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b"))
    }
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
    else if (loaded.bucketed)
      // bucketed batch shape: ONE corpus `sets` scan feeds BOTH verify
      // directions (r21 verdict #2 — the per-direction split read the
      // corpus-sized table twice). Direction-tagged candidates join the
      // delta sets first (delta-bounded), then the corpus table joins
      // LAST, in place (bucketed+sorted on doc_id — zero exchange, zero
      // sort on the corpus side, same contract as the split shape), with
      // the contained side's size dividing per direction. The delta
      // `sets` derivation also evaluates once instead of once per
      // direction. Each direction's candidates are unique by
      // construction; the final distinct collapses the one overlap a
      // RE-probe can produce, exactly as the split union's did.
      DedupQueries.verifyContainmentOneScan(corpusSets, deltaSets,
          rawNewInOld.distinct(), rawOldInNew.distinct())
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

  /** The bucketed micro probe's two candidate frames (new-in-old,
    * old-in-new), LAZY — the plans that touch the corpus posting tables
    * per micro batch. The delta's distinct token hashes collect once
    * (prefixes ⊆ tokens, so ONE key set prunes all three hx-keyed
    * tables) and BUCKET-PRUNE the `df`/`tokens`/`prefix` scans; delta
    * sides broadcast. [[probeLoaded]] collects both; exposed so the plan
    * spec can assert the pruning on the frames themselves
    * (`ContainIndexBucketedSpec`).
    *
    * The key collect is CAPPED at one past the largest count any table
    * could use (a batch's token-hash volume is docs × shingles — ~200 k
    * for a 200-doc batch, far past toy bucket counts): `limit` bounds
    * the driver transfer, and an overflowed collect declines pruning for
    * every hx table rather than shipping a key set no table can use.
    */
  private[graft] def microCandidateFrames(loaded: Loaded,
      deltaDocs: DataFrame): (DataFrame, DataFrame) =
    microCandidateFramesOf(loaded, shingled(deltaDocs))

  /** [[microCandidateFrames]] over an already-shingled (possibly
    * persisted) delta frame — what [[probeLoaded]]'s eager window uses
    * so its three jobs share one shingle derivation.
    */
  private def microCandidateFramesOf(loaded: Loaded,
      sh: DataFrame): (DataFrame, DataFrame) = {
    val hxCap = math.min(IndexLayout.MicroPruneMaxKeys.toLong,
      IndexLayout.PruneKeysPerBucket.toLong * Seq("tokens", "prefix", "df")
        .map(loaded.buckets.getOrElse(_, Int.MaxValue)).max).toInt
    val hxRows = sh.select(col("hx")).distinct().limit(hxCap + 1)
      .collect()
    val deltaHx: Option[Seq[Long]] =
      if (hxRows.length > hxCap) None
      else Some(hxRows.map(_.getLong(0)).toSeq)
    def pruneHx(corpus: DataFrame, table: String): DataFrame =
      deltaHx.fold(corpus)(IndexLayout.pruned(corpus, "hx", _,
        loaded.buckets.getOrElse(table, Int.MaxValue)))
    // df shrink as in probeLoaded's micro dfForRank, on the PRUNED scan
    val dfForRank = broadcast(pruneHx(loaded.df, "df")
      .join(broadcast(sh.select(col("hx")).distinct()), "hx"))
    val r = DedupQueries.containRanked(sh, dfForRank)
    val deltaPrefix = DedupQueries.containPrefix(r)
      .select(col("hx"), col("doc_id"))
    val deltaTokens = r.select(col("hx"), col("doc_id"))
    // L0 leg per direction (see probeRaw's overCorpus): the base scan
    // keeps its INSET bucket pruning; the L0 files are delta-sized and
    // scan whole — the equi-join restricts them the same way
    def withL0(base: DataFrame, l0: Option[DataFrame])(
        leg: DataFrame => DataFrame): DataFrame =
      l0.fold(leg(base))(d => leg(base).unionByName(leg(d)))
    val n2o = withL0(pruneHx(loaded.tokens, "tokens"), loaded.l0Tokens) {
      c =>
        broadcast(deltaPrefix.withColumnRenamed("doc_id", "id_a"))
          .join(c.withColumnRenamed("doc_id", "id_b"), "hx")
          .where(col("id_a") =!= col("id_b"))
          .select(col("id_a"), col("id_b"))
    }.distinct()
    val o2n = withL0(pruneHx(loaded.prefix, "prefix"), loaded.l0Prefix) {
      c =>
        c.withColumnRenamed("doc_id", "id_a")
          .join(broadcast(deltaTokens.withColumnRenamed("doc_id", "id_b")),
            "hx")
          .where(col("id_a") =!= col("id_b"))
          .select(col("id_a"), col("id_b"))
    }.distinct()
    (n2o, o2n)
  }
}
