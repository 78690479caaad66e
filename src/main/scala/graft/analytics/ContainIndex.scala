package graft.analytics

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.VersionedStore

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
  * Like [[DedupIndex]], the artifact is VERSIONED behind an atomic
  * `_CURRENT` pointer with deltaId-idempotent [[append]]: an
  * at-least-once ingest loop can retry an admission without duplicating
  * postings (duplicate `sets` rows would double every pair the verify
  * join emits), a crash mid-admission leaves the previous version
  * intact, and readers never see a torn index.
  */
object ContainIndex {

  private def shingled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(expr(DedupQueries.containShingleExpr)).as("sh"))
      .distinct()
      .select(col("doc_id"), xxhash64(col("sh")).as("hx"))

  // df-rank + fragment floor live in ONE place (DedupQueries.containRanked)
  // so the artifact can never drift from the oracled query
  private def ranked(sh: DataFrame, dfTable: DataFrame): DataFrame =
    DedupQueries.containRanked(sh, dfTable)

  private def versionDir(indexDir: String, v: Long): File =
    new File(indexDir, s"v$v")

  private def currentDir(indexDir: String): Option[File] =
    VersionedStore.currentVersion(indexDir).map(versionDir(indexDir, _))

  /** The current version's path for `table`. */
  def tablePath(indexDir: String, table: String): String = {
    val cur = currentDir(indexDir).getOrElse(
      throw new IllegalStateException(s"no index at $indexDir — build first"))
    new File(cur, table).toString
  }

  /** Delta ids already admitted into the current version. */
  def appliedDeltas(indexDir: String): Set[String] =
    currentDir(indexDir).map(readDeltas).getOrElse(Set.empty)

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

  private def writePostings(r: DataFrame, sh: DataFrame, ver: File,
      mode: String): Unit = {
    r.select(col("hx"), col("doc_id"))
      .write.mode(mode).parquet(new File(ver, "tokens").toString)
    DedupQueries.containPrefix(r)
      .select(col("hx"), col("doc_id"))
      .write.mode(mode).parquet(new File(ver, "prefix").toString)
    sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("hx"))).as("hs"))
      .withColumn("sz", size(col("hs")).cast("long"))
      .filter(col("sz") >= 20)
      .write.mode(mode).parquet(new File(ver, "sets").toString)
  }

  /** Build (or fully REBUILD, re-freshening df) from a `(doc_id, text)`
    * corpus frame — a fresh version committed by pointer swap.
    */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String): Unit = {
    val v = VersionedStore.currentVersion(indexDir).getOrElse(-1L) + 1
    val next = versionDir(indexDir, v)
    VersionedStore.clearStale(next)
    val sh = shingled(docs).persist()
    try {
      val dfTable = sh.groupBy(col("hx")).agg(count(lit(1)).as("df"))
      dfTable.write.mode("overwrite")
        .parquet(new File(next, "df").toString)
      writePostings(ranked(sh, dfTable), sh, next, "overwrite")
      writeDeltas(next, Set.empty)
      VersionedStore.swapPointer(indexDir, v)
    } finally { sh.unpersist(); () }
  }

  /** ADMIT a delta (probe-then-admit lifecycle): returns true if
    * admitted, false if `deltaId` was already applied. The delta's
    * prefixes are ranked by the FROZEN corpus df (unseen tokens rarest)
    * and df is NOT rewritten — safe by the pigeonhole's
    * order-independence, and precisely what keeps admission O(|delta|):
    * a df rewrite would be a corpus-sized job on every ingest.
    * Re-freshen df with a periodic [[build]] when probe cost drifts.
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
      Seq("tokens", "prefix", "sets", "df").foreach(t =>
        VersionedStore.linkTree(new File(cur, t), new File(next, t)))
      val sh = shingled(docs).persist()
      try {
        val corpusDf = spark.read.parquet(new File(cur, "df").toString)
        writePostings(ranked(sh, corpusDf), sh, next, "append")
        writeDeltas(next, applied + deltaId)
        VersionedStore.swapPointer(indexDir, curV + 1)
      } finally { sh.unpersist(); () }
      true
    }
  }

  /** Drop index versions older than the newest `keep`. */
  def prune(indexDir: String, keep: Int = 2): Unit =
    VersionedStore.prune(indexDir, keep)

  /** Probe with a `(doc_id, text)` delta frame: ordered containment
    * pairs (id_a contained-in id_b, ≥ 0.9) with exactly one side in the
    * delta — both directions found by delta-sized probes of the standing
    * tables (delta prefixes × `tokens`, delta tokens × `prefix`).
    */
  def probe(spark: SparkSession, indexDir: String,
      deltaDocs: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    // no persist — see DedupIndex.probe: a lazy return plus an
    // un-released cache entry per daily probe is a session-length leak
    val sh = shingled(deltaDocs)
    val corpusDf = spark.read.parquet(tablePath(indexDir, "df"))
    val r = ranked(sh, corpusDf)
    val deltaPrefix = DedupQueries.containPrefix(r)
      .select(col("hx"), col("doc_id"))
    val deltaTokens = r.select(col("hx"), col("doc_id"))
    val corpusTokens = spark.read.parquet(tablePath(indexDir, "tokens"))
    val corpusPrefix = spark.read.parquet(tablePath(indexDir, "prefix"))
    val newInOld = deltaPrefix.withColumnRenamed("doc_id", "id_a")
      .join(corpusTokens.withColumnRenamed("doc_id", "id_b"), "hx")
    val oldInNew = corpusPrefix.withColumnRenamed("doc_id", "id_a")
      .join(deltaTokens.withColumnRenamed("doc_id", "id_b"), "hx")
    val cand = newInOld.unionByName(oldInNew)
      .select(col("id_a"), col("id_b")).distinct()
    val deltaSets = sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("hx"))).as("hs"))
      .withColumn("sz", size(col("hs")).cast("long"))
      .filter(col("sz") >= 20)
    val per = spark.read.parquet(tablePath(indexDir, "sets"))
      .unionByName(deltaSets)
    DedupQueries.verifyContainment(per, cand)
  }
}
