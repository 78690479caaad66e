package graft.analytics

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.VersionedStore

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
  * The artifact is VERSIONED behind the same atomic `_CURRENT` pointer as
  * the serving stores (`indexDir/v{N}/{signatures,bands}`), because its
  * writer is the probe-then-admit ingest loop — an at-least-once context:
  *   - [[append]] takes a caller-supplied `deltaId` (the micro-batch id,
  *     the ingest date — any stable identity) recorded in the version's
  *     `_deltas.txt`; a RETRIED admission of an applied id is a no-op, so
  *     redelivery can never double-insert postings (duplicated SIGNATURE
  *     rows would make the verify join emit every matching pair once per
  *     copy — band-key duplicates are absorbed by the candidate distinct,
  *     signature duplicates are not);
  *   - each admission hard-links the previous version's files and appends
  *     only the delta's part files — O(|delta|) write, atomic pointer
  *     swap, readers never see a torn index, and a crash mid-admission
  *     leaves the pointer on the intact previous version (the retry
  *     clears the never-referenced leftover before rebuilding it).
  *
  * At cluster scale the two parquet writes become `saveAsTable` with
  * `bucketBy(n, "band", "sig")` / `bucketBy(n, "doc_id")` (see
  * [[Bucketing]]) so the probe's equi-joins elide the corpus-side shuffle
  * entirely; the layout and probe plan do not change. Staleness is the
  * caller's contract, same as [[AnnIndex]]: [[build]] rebuilds from
  * scratch into a fresh version.
  */
object DedupIndex {

  private def versionDir(indexDir: String, v: Long): File =
    new File(indexDir, s"v$v")

  private def currentDir(indexDir: String): Option[File] =
    VersionedStore.currentVersion(indexDir).map(versionDir(indexDir, _))

  /** The current version's path for `table` — also the spec/observability
    * hook for reading the artifact directly.
    */
  def tablePath(indexDir: String, table: String): String = {
    val cur = currentDir(indexDir).getOrElse(
      throw new IllegalStateException(s"no index at $indexDir — build first"))
    new File(cur, table).toString
  }

  /** Delta ids already admitted into the current version. */
  def appliedDeltas(indexDir: String): Set[String] =
    currentDir(indexDir).map(d => readDeltas(d)).getOrElse(Set.empty)

  private def readDeltas(ver: File): Set[String] = {
    val f = new File(ver, "_deltas.txt")
    if (!f.exists()) Set.empty
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).toSet
  }

  private def writeDeltas(ver: File, ids: Set[String]): Unit = {
    Files.write(new File(ver, "_deltas.txt").toPath,
      ids.toSeq.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))
    ()
  }

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
    * frame — a fresh version with an empty admitted-delta set, committed
    * by pointer swap.
    */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String): Unit = {
    val v = VersionedStore.currentVersion(indexDir).getOrElse(-1L) + 1
    val next = versionDir(indexDir, v)
    VersionedStore.clearStale(next)
    writeTables(docs, next, "overwrite")
    writeDeltas(next, Set.empty)
    VersionedStore.swapPointer(indexDir, v)
  }

  /** ADMIT a delta into the standing index (probe-then-admit lifecycle):
    * returns true if admitted, false if `deltaId` was already applied —
    * the idempotence an at-least-once ingest loop requires. O(|delta|)
    * write: previous files carry as hard links, only the delta's part
    * files are new.
    */
  def append(spark: SparkSession, docs: DataFrame, indexDir: String,
      deltaId: String): Boolean = {
    val curV = VersionedStore.currentVersion(indexDir).getOrElse(
      throw new IllegalStateException(s"no index at $indexDir — build first"))
    val cur = versionDir(indexDir, curV)
    val applied = readDeltas(cur)
    if (applied.contains(deltaId)) false
    else {
      val next = versionDir(indexDir, curV + 1)
      VersionedStore.clearStale(next)
      Seq("signatures", "bands").foreach(t =>
        VersionedStore.linkTree(new File(cur, t), new File(next, t)))
      writeTables(docs, next, "append")
      writeDeltas(next, applied + deltaId)
      VersionedStore.swapPointer(indexDir, curV + 1)
      true
    }
  }

  /** Drop index versions older than the newest `keep` — hard-linked
    * carried files survive in newer versions.
    */
  def prune(indexDir: String, keep: Int = 2): Unit =
    VersionedStore.prune(indexDir, keep)

  /** Probe the index with a `(doc_id, text)` delta frame: verified
    * near-dup pairs (corpus_id, new_id, jaccard ≥ 0.8) between the delta
    * and the indexed corpus. Cost is O(|delta| + matches) — nothing
    * corpus-sized is computed, only scanned through the equi-join.
    */
  def probe(spark: SparkSession, indexDir: String,
      deltaDocs: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val corpusPer = spark.read.parquet(tablePath(indexDir, "signatures"))
    val corpusBands = spark.read.parquet(tablePath(indexDir, "bands"))
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
    val cand = deltaBands.join(corpusBands, Seq("band", "sig"))
      .select(col("id_a"), col("id_b")).distinct()
    DedupQueries.verifyJaccardSplit(corpusPer, deltaPer, cand, 0.8)
      .select(col("id_a").as("corpus_id"), col("id_b").as("new_id"),
        col("jaccard"))
  }
}
