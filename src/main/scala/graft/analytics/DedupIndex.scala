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
  *   - `bands`       (band, sig, doc_id) — the 16×4 banded bucket keys;
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

  private val Tables = Seq("signatures", "bands")

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

  /** The current version's path for `table` — observability/spec hook;
    * multi-table READS should go through one [[VersionedArtifact
    * .snapshotPaths]] resolution, as [[probe]] does.
    */
  def tablePath(indexDir: String, table: String): String =
    artifact(indexDir).tablePath(table)

  /** Delta ids already admitted into the current version. */
  def appliedDeltas(indexDir: String): Set[String] =
    artifact(indexDir).appliedDeltas

  private def writeTables(docs: DataFrame, ver: File, mode: String): Unit = {
    // signaturesOf already carries (doc_id, mhsig, hs, sz)
    val per = DedupQueries.signaturesOf(docs).persist()
    try {
      per.write.mode(mode).parquet(new File(ver, "signatures").toString)
      val bandCols = DedupQueries.bandStructs(bands = 16, rowsPerBand = 4)
      per.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
        .select(col("bs.band").as("band"), col("bs.sig").as("sig"),
          col("doc_id"))
        .write.mode(mode).parquet(new File(ver, "bands").toString)
    } finally { per.unpersist(); () }
  }

  /** Build (or fully REBUILD) the index from a `(doc_id, text)` corpus
    * frame — a fresh version with an empty admitted-delta set.
    */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String): Unit = {
    buildRuns.incrementAndGet()
    artifact(indexDir).build(writeTables(docs, _, "overwrite"))
  }

  /** ADMIT a delta (probe-then-admit lifecycle): true if admitted, false
    * if `deltaId` was already applied. O(|delta|) write — previous files
    * carry as hard links, only the delta's part files are new.
    */
  def append(spark: SparkSession, docs: DataFrame, indexDir: String,
      deltaId: String): Boolean =
    artifact(indexDir).admit(deltaId, Tables, writeTables(docs, _, "append"))

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
      table: String, buckets: Int = 8): Unit = {
    val per = DedupQueries.signaturesOf(docs)
    val bandCols = DedupQueries.bandStructs(bands = 16, rowsPerBand = 4)
    per.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("bs.band").as("band"), col("bs.sig").as("sig"),
        col("doc_id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, "band", "sig").sortBy("band", "sig")
      .saveAsTable(table)
  }

  /** The raw candidate join against a [[buildBucketedBands]] table,
    * BEFORE the dedup distinct — exposed so the plan-shape spec can
    * assert the corpus side joins with no Exchange (the distinct above it
    * necessarily adds one for its own aggregation).
    */
  private[graft] def bucketedCandidates(spark: SparkSession, table: String,
      deltaPer: DataFrame): DataFrame = {
    val bandCols = DedupQueries.bandStructs(bands = 16, rowsPerBand = 4)
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
    * doc_id-bucketed table of its own).
    */
  def probeBucketed(spark: SparkSession, table: String, corpusPer: DataFrame,
      deltaDocs: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val deltaPer = DedupQueries.signaturesOf(deltaDocs)
    val cand = bucketedCandidates(spark, table, deltaPer)
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
      deltaDocs: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val paths = artifact(indexDir).snapshotPaths(Tables)
    val corpusPer = spark.read.parquet(paths("signatures"))
    val corpusBands = spark.read.parquet(paths("bands"))
      .withColumnRenamed("doc_id", "id_a")
    // no persist: the probe returns a LAZY frame, and a persist here with
    // no unpersist would pin a cache entry per daily probe for the life
    // of the ingest session; the delta-sized recompute across the frame's
    // few consumers is cheaper than that leak
    val deltaPer = DedupQueries.signaturesOf(deltaDocs)
    val bandCols = DedupQueries.bandStructs(bands = 16, rowsPerBand = 4)
    val deltaBands = deltaPer
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("bs.band").as("band"), col("bs.sig").as("sig"),
        col("doc_id").as("id_b"))
    // id_a =!= id_b: a RE-probe after admission (the at-least-once retry
    // the deltaId-idempotent admit exists for) would otherwise match every
    // delta doc against its own admitted copy at jaccard 1.0 and report
    // the whole retried delta as corpus duplicates — a keeper policy
    // downstream would then drop it. Batch faces filter the same way.
    val cand = deltaBands.join(corpusBands, Seq("band", "sig"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    DedupQueries.verifyJaccardSplit(corpusPer, deltaPer, cand, 0.8)
      .select(col("id_a").as("corpus_id"), col("id_b").as("new_id"),
        col("jaccard"))
  }
}
