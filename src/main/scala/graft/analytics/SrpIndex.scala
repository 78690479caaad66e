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
  * Two parquet tables inside each version:
  *   - `bands`   (band, bits, vec_id) — the banded sign-bit bucket keys;
  *   - `vectors` (vec_id, v, nrm) — double vectors + norms for the exact
  *               cosine verify (the SRP collision is recall machinery;
  *               every emitted pair passes cos ≥ 0.46 exactly).
  *
  * The BAND SHAPE is a [[build]] parameter RECORDED IN THE ARTIFACT
  * (`_meta.txt`, carried through admit/compact): a probe must band its
  * delta with the exact shape the corpus was banded with — a mismatched
  * probe would equi-join band values from different hyperplane layouts
  * and emit noise — so [[probe]]/[[append]] read the shape from the
  * artifact, never from a caller argument. The default is the
  * CORPUS-SCALE [[DedupQueries.Srp.Wide]] (8 bands × 16 sign bits, 2¹⁶
  * values/band): bucket occupancy on near-orthogonal vectors stays
  * density-bound deep into corpus growth, where the 8×4 `Narrow` shape's
  * 2⁴ values/band degenerate to 16 giant buckets and quadratic candidate
  * volume (measured ×20.9 vs ×1.7 wall at 10× data — SCALE.md). The
  * oracled face builds with `Narrow` explicitly because its DuckDB
  * oracle replays that seeded pipeline; artifacts written before the
  * shape was recorded read back as `Narrow` (the only shape that
  * revision ever built).
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

  /** The committed version id behind the _CURRENT pointer — one file
    * read; what a long-lived prober polls per micro-batch to bound its
    * cache's staleness to one batch (see `IngestDedup`).
    */
  def currentVersion(indexDir: String): Option[Long] =
    artifact(indexDir).currentVersion

  /** The current version's path for `table` — observability/spec hook. */
  def tablePath(indexDir: String, table: String): String =
    artifact(indexDir).tablePath(table)

  /** Delta ids already admitted into the current version. */
  def appliedDeltas(indexDir: String): Set[String] =
    artifact(indexDir).appliedDeltas

  /** The band shape the artifact was BUILT with — what every probe/admit
    * must replay. Pre-metadata artifacts (r12) read back as `Narrow`,
    * the only shape that revision ever wrote.
    */
  private[analytics] def shapeOf(indexDir: String): DedupQueries.SrpShape = {
    val m = artifact(indexDir).meta
    (m.get("bands"), m.get("rowsPerBand")) match {
      case (Some(b), Some(r)) =>
        DedupQueries.SrpShape(b.toInt * r.toInt, b.toInt, r.toInt)
      case _ => DedupQueries.Srp.Narrow
    }
  }

  private def writeTables(spark: SparkSession, vecs: DataFrame, ver: File,
      mode: String, shape: DedupQueries.SrpShape): Unit = {
    val v = DedupQueries.srpVectorsOf(spark, vecs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      v.write.mode(mode).parquet(new File(ver, "vectors").toString)
      DedupQueries.srpBandsOf(spark, v, shape)
        .write.mode(mode).parquet(new File(ver, "bands").toString)
    } finally { v.unpersist(); () }
  }

  /** Build (or fully REBUILD) from a `(vec_id, embedding)` corpus frame.
    * `shape` is recorded in the artifact and rules every later
    * probe/admit; the default is the corpus-scale `Wide` banding (see
    * class doc for why `Narrow` cannot reach 100 TB).
    */
  def build(spark: SparkSession, vecs: DataFrame, indexDir: String,
      shape: DedupQueries.SrpShape = DedupQueries.Srp.Wide): Unit = {
    buildRuns.incrementAndGet()
    artifact(indexDir).build(writeTables(spark, vecs, _, "overwrite", shape),
      buildMeta = Map("bands" -> shape.bands.toString,
        "rowsPerBand" -> shape.rowsPerBand.toString))
  }

  /** ADMIT a delta (probe-then-admit): true if admitted, false if
    * `deltaId` was already applied. O(|delta|) write, hard-link carry.
    * Bands with the shape the artifact records — never a caller choice.
    */
  def append(spark: SparkSession, vecs: DataFrame, indexDir: String,
      deltaId: String): Boolean =
    artifact(indexDir).admit(deltaId, Tables,
      writeTables(spark, vecs, _, "append", shapeOf(indexDir)))

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
      deltaVecs: DataFrame): DataFrame =
    probeLoaded(load(spark, indexDir), deltaVecs)

  /** CLUSTER-SCALE layout — the [[DedupIndex.buildBucketedBands]]
    * treatment for the SRP family: both corpus tables as managed parquet
    * tables bucketed (and sorted) on their probe-side join keys — bands
    * on `(band, bits)` (the candidate equi-join), vectors on `vec_id`
    * (the exact-cosine verify lookup) — so every probe reads corpus
    * buckets IN PLACE and only the delta (and the candidate rows) ever
    * exchange (`SrpIndexBucketedSpec` pins the single-band-Exchange plan
    * and pair parity with the directory artifact). Bucket count targets
    * ~128–512 MB per bucket file ([[Bucketing]] sizing rule).
    */
  def buildBucketedTables(spark: SparkSession, vecs: DataFrame,
      tablePrefix: String, buckets: Int = 0,
      shape: DedupQueries.SrpShape = DedupQueries.Srp.Wide): Unit = {
    val v = DedupQueries.srpVectorsOf(spark, vecs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // buckets = 0: per-table sizing from bytes (Bucketing rule) — the
      // count rides the persisted frame, so it costs one cached scan.
      // Vector rows carry the float array (dims × 4 B + norm); band rows
      // are bands/vector at ~24 B (band, bits, vec_id)
      val rows = if (buckets > 0) 0L else v.count()
      // rows == 0 guard: first() on an empty frame throws — an empty
      // corpus builds 1-bucket empty tables instead (sizedBuckets(0) = 1)
      val dims = if (buckets > 0 || rows == 0) 0
        else v.select(size(col("v"))).first().getInt(0)
      val cap = Bucketing.sessionMaxBuckets(spark)
      val vN = if (buckets > 0) buckets
        else Bucketing.sizedBuckets(rows * (dims * 4L + 16L), maxBuckets = cap)
      val bN = if (buckets > 0) buckets
        else Bucketing.sizedBuckets(rows * shape.bands * 24L, maxBuckets = cap)
      v.write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
        .bucketBy(vN, "vec_id").sortBy("vec_id")
        .saveAsTable(s"${tablePrefix}_vectors")
      DedupQueries.srpBandsOf(spark, v, shape)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
        .bucketBy(bN, "band", "bits").sortBy("band", "bits")
        .saveAsTable(s"${tablePrefix}_bands")
      // shape rides the band table's TBLPROPERTIES — the managed-table
      // twin of the directory artifact's _meta.txt (DedupIndex precedent)
      Bucketing.setTableProps(spark, s"${tablePrefix}_bands", Map(
        "graft.bands" -> shape.bands.toString,
        "graft.rowsPerBand" -> shape.rowsPerBand.toString))
    } finally { v.unpersist(); () }
  }

  /** Shape recorded by [[buildBucketedTables]]. Missing properties are a
    * LOUD error — see [[DedupIndex.bucketedShapeOf]]: a guessed default
    * silently near-empties the probe for any table built at the other
    * shape (or by a build that crashed before its property write).
    */
  def bucketedShapeOf(spark: SparkSession,
      tablePrefix: String): DedupQueries.SrpShape = {
    val props = Bucketing.tableProps(spark, s"${tablePrefix}_bands")
    (props.get("graft.bands"), props.get("graft.rowsPerBand")) match {
      case (Some(b), Some(r)) =>
        DedupQueries.SrpShape(b.toInt * r.toInt, b.toInt, r.toInt)
      case _ => throw new IllegalStateException(
        s"SRP band table ${tablePrefix}_bands has no recorded shape: " +
          "rebuild with buildBucketedTables, or record the build shape " +
          "once via ALTER TABLE ... SET TBLPROPERTIES " +
          "('graft.bands' = '<bands>', 'graft.rowsPerBand' = '<rows>')")
    }
  }

  /** [[probe]] against [[buildBucketedTables]] output. The band shape is
    * resolved from the tables' recorded properties ([[bucketedShapeOf]])
    * — never a caller guess.
    */
  def probeBucketed(spark: SparkSession, tablePrefix: String,
      deltaVecs: DataFrame): DataFrame =
    probeLoaded(Loaded(spark.table(s"${tablePrefix}_vectors"),
      spark.table(s"${tablePrefix}_bands"),
      bucketedShapeOf(spark, tablePrefix)), deltaVecs)

  /** The artifact's tables + shape resolved against ONE pointer read —
    * what a LONG-LIVED prober (the streaming embedding-ingest face)
    * loads once and persists, so every micro-batch probes memory instead
    * of re-reading the artifact from the lake.
    */
  final case class Loaded(vectors: DataFrame, bands: DataFrame,
      private[graft] val shape: DedupQueries.SrpShape)

  /** Artifact-load counter — the [[buildRuns]]-style observability hook:
    * lets `IngestDedupSpec` prove a multi-batch ingest stream resolved
    * the artifact ONCE, not per batch.
    */
  val loadRuns = new java.util.concurrent.atomic.AtomicLong(0)

  def load(spark: SparkSession, indexDir: String): Loaded = {
    loadRuns.incrementAndGet()
    // shape resolved from the artifact BEFORE the path snapshot: both
    // come from the same current version under the single-writer
    // contract, and every delta MUST band with the corpus's build shape
    val shape = shapeOf(indexDir)
    val paths = artifact(indexDir).snapshotPaths(Tables)
    Loaded(spark.read.parquet(paths("vectors")),
      spark.read.parquet(paths("bands")), shape)
  }

  /** [[probe]] against pre-loaded (possibly persisted) artifact frames.
    *
    * `micro = true` declares `deltaVecs` a MICRO-BATCH (the streaming
    * ingest face): delta bands and candidates broadcast into the corpus
    * joins, so the cached band/vector tables STREAM with zero per-batch
    * exchange — see [[ContainIndex.probeLoaded]].
    */
  def probeLoaded(loaded: Loaded, deltaVecs: DataFrame,
      micro: Boolean = false): DataFrame = {
    val spark = deltaVecs.sparkSession
    val corpusVectors = loaded.vectors
    val corpusBands = loaded.bands.withColumnRenamed("vec_id", "id_a")
    // no persist — lazy return; see DedupIndex.probe's leak note
    val deltaV = DedupQueries.srpVectorsOf(spark, deltaVecs)
    val deltaBands = DedupQueries
      .srpBandsOf(spark, deltaV, loaded.shape)
      .withColumnRenamed("vec_id", "id_b")
    // id_a =!= id_b: re-probe of an admitted delta must not self-match
    val deltaSide = if (micro) broadcast(deltaBands) else deltaBands
    val cand = deltaSide.join(corpusBands, Seq("band", "bits"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val withCorpus = (if (micro) broadcast(cand) else cand)
      .join(corpusVectors.select(col("vec_id").as("id_a"),
        col("v").as("av"), col("nrm").as("an")), Seq("id_a"))
    (if (micro) broadcast(withCorpus) else withCorpus)
      .join(deltaV.select(col("vec_id").as("id_b"),
        col("v").as("bv"), col("nrm").as("bn")), Seq("id_b"))
      .select(col("id_a").as("corpus_id"), col("id_b").as("new_id"),
        (expr("graft_dot(av, bv)") / (col("an") * col("bn"))).as("cos"))
      .filter(col("cos") >= 0.46)
      .distinct()
  }
}
