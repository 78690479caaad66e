package graft.analytics

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.VersionedArtifact

/** PERSISTED banded-SRP (sign-LSH) index — the embedding counterpart of
  * [[DedupIndex]], completing the durable-artifact family for all three
  * incremental dedup faces (shingle jaccard, containment, embedding
  * cosine): build once at corpus embedding ingest, then every delta batch
  * probes the standing band table from disk with O(|delta| + matches)
  * compute and no corpus re-banding.
  *
  * Two parquet tables inside each version ([[DedupQueries.Srp.Narrow]]
  * shape — the oracled face's 8×4 banding):
  *   - `bands`   (band, bits, vec_id) — the banded sign-bit bucket keys;
  *   - `vectors` (vec_id, v, nrm) — double vectors + norms for the exact
  *               cosine verify (the SRP collision is recall machinery;
  *               every emitted pair passes cos ≥ 0.46 exactly).
  *
  * Versioning + deltaId-idempotent probe-then-admit + compaction ride the
  * same [[graft.streaming.VersionedArtifact]] lifecycle as the other two
  * indexes — one admission protocol, no drift. Probes filter
  * `id_a =!= id_b` so the at-least-once RE-probe of an admitted delta
  * cannot report cos-1.0 self-matches (`SrpIndexSpec`).
  */
object SrpIndex {

  private val Tables = Seq("vectors", "bands")

  /** Corpus-build counter — see [[DedupIndex.buildRuns]]. */
  val buildRuns = new java.util.concurrent.atomic.AtomicLong(0)

  /** Whether the artifact has a committed current version. */
  def hasCurrent(indexDir: String): Boolean =
    artifact(indexDir).currentVersion.isDefined

  private def artifact(indexDir: String) = new VersionedArtifact(indexDir)

  /** The current version's path for `table` — observability/spec hook. */
  def tablePath(indexDir: String, table: String): String =
    artifact(indexDir).tablePath(table)

  /** Delta ids already admitted into the current version. */
  def appliedDeltas(indexDir: String): Set[String] =
    artifact(indexDir).appliedDeltas

  private def writeTables(spark: SparkSession, vecs: DataFrame, ver: File,
      mode: String): Unit = {
    val v = DedupQueries.srpVectorsOf(spark, vecs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      v.write.mode(mode).parquet(new File(ver, "vectors").toString)
      DedupQueries.srpBandsOf(spark, v, DedupQueries.Srp.Narrow)
        .write.mode(mode).parquet(new File(ver, "bands").toString)
    } finally { v.unpersist(); () }
  }

  /** Build (or fully REBUILD) from a `(vec_id, embedding)` corpus frame. */
  def build(spark: SparkSession, vecs: DataFrame, indexDir: String): Unit = {
    buildRuns.incrementAndGet()
    artifact(indexDir).build(writeTables(spark, vecs, _, "overwrite"))
  }

  /** ADMIT a delta (probe-then-admit): true if admitted, false if
    * `deltaId` was already applied. O(|delta|) write, hard-link carry.
    */
  def append(spark: SparkSession, vecs: DataFrame, indexDir: String,
      deltaId: String): Boolean =
    artifact(indexDir).admit(deltaId, Tables,
      writeTables(spark, vecs, _, "append"))

  /** Drop versions older than the newest `keep` — see
    * [[DedupIndex.prune]]'s reader-grace note. */
  def prune(indexDir: String, keep: Int = 2): Unit =
    artifact(indexDir).prune(keep)

  /** Compact tables past `maxFiles` part files — the shared
    * [[VersionedArtifact.compact]] transaction; postings re-cluster on
    * the probe's band key, vectors on vec_id.
    */
  def compact(spark: SparkSession, indexDir: String,
      maxFiles: Int = 64): Int =
    artifact(indexDir).compact(Tables, maxFiles) { (src, tgt) =>
      val df = spark.read.parquet(src)
      val out =
        if (tgt.getName == "bands") df.repartition(col("band"))
        else df.repartition(col("vec_id"))
      out.write.mode("overwrite").parquet(tgt.toString)
    }

  /** Probe with a `(vec_id, embedding)` delta frame: verified near-dup
    * pairs (corpus_id, new_id, cos ≥ 0.46) between the delta and the
    * indexed corpus — delta bands equi-join the standing band table,
    * candidates verify by exact cosine against the standing vector
    * table. All tables resolve against ONE pointer read.
    */
  def probe(spark: SparkSession, indexDir: String,
      deltaVecs: DataFrame): DataFrame = {
    val paths = artifact(indexDir).snapshotPaths(Tables)
    val corpusVectors = spark.read.parquet(paths("vectors"))
    val corpusBands = spark.read.parquet(paths("bands"))
      .withColumnRenamed("vec_id", "id_a")
    // no persist — lazy return; see DedupIndex.probe's leak note
    val deltaV = DedupQueries.srpVectorsOf(spark, deltaVecs)
    val deltaBands = DedupQueries
      .srpBandsOf(spark, deltaV, DedupQueries.Srp.Narrow)
      .withColumnRenamed("vec_id", "id_b")
    // id_a =!= id_b: re-probe of an admitted delta must not self-match
    val cand = deltaBands.join(corpusBands, Seq("band", "bits"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(corpusVectors.select(col("vec_id").as("id_a"),
        col("v").as("av"), col("nrm").as("an")), Seq("id_a"))
      .join(deltaV.select(col("vec_id").as("id_b"),
        col("v").as("bv"), col("nrm").as("bn")), Seq("id_b"))
      .select(col("id_a").as("corpus_id"), col("id_b").as("new_id"),
        (expr("graft_dot(av, bv)") / (col("an") * col("bn"))).as("cos"))
      .filter(col("cos") >= 0.46)
      .distinct()
  }
}
