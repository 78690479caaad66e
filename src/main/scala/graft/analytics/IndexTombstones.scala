package graft.analytics

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.VersionedArtifact

/** Document DELETION for the versioned index artifacts — the lifecycle
  * piece a training-data pipeline needs the day a takedown request,
  * contamination report, or opt-out lands: the standing corpus indexes
  * ([[DedupIndex]]/[[SrpIndex]]/[[ContainIndex]]) otherwise only grow.
  * (The reference has no analogue — its state is a CDC passthrough; this
  * is part of the driver-mandated pipeline surface.)
  *
  * Two-phase, the same shape the lakehouse formats settled on
  * (copy-on-write only when you must):
  *
  *   1. LOGICAL — [[delete]] admits the ids into a `tombstones` sidecar
  *      dir through the SAME deltaId-idempotent `admit` transaction as
  *      data admission (a retried takedown is a no-op; the tombstone set
  *      and the pointer move atomically). Every probe then anti-joins
  *      its output pairs against the set — tombstones are
  *      deletion-bounded and broadcast, so the filter is O(pairs), and
  *      an absent sidecar costs literally nothing (the common case).
  *      The sidecar rides every lifecycle step (admission, compaction,
  *      prune carry) as a hard-linked extra.
  *   2. PHYSICAL — [[DedupIndex.purge]]/[[SrpIndex.purge]]/
  *      [[ContainIndex.purge]] rewrite the tables WITHOUT the tombstoned
  *      rows and drop the sidecar, in one pointer swap. Purge is the
  *      compliance backstop, priced honestly: it rewrites whole tables
  *      (deleted rows sit in band/posting buckets keyed by band/token
  *      hash, not by doc id, so an eager sweep is inherently O(table) —
  *      the reason the DEFAULT is the logical filter, which makes purge
  *      schedulable instead of urgent). Tables with no document-id
  *      column (ContainIndex's token-df) carry as links: a deleted
  *      doc's df contribution is an efficiency-only drift by the
  *      prefix-filter's order-independence (see
  *      `DedupQueries.qDedupContainmentIncremental`).
  *
  * Delta-side ids are filtered too: a pair is never reported if EITHER
  * side is tombstoned, so a re-probe of a batch whose docs were since
  * deleted stays silent about them.
  */
private[graft] object IndexTombstones {

  /** Sidecar dir name inside a version (not in any family's `Tables`). */
  val Table = "tombstones"

  /** Admit `ids` (single LongType column, any name) as tombstones under
    * `deltaId` — false if the id was already applied. Shares the data
    * admissions' deltaId namespace on purpose: one ledger per artifact,
    * so callers namespace their ids (`takedown-…`) like streams do.
    */
  def delete(art: VersionedArtifact, tables: Seq[String],
      ids: DataFrame, deltaId: String): Boolean =
    deleteAll(art, tables, Seq(ids -> deltaId))

  /** [[delete]] for a BATCH of requests in ONE version bump (the
    * takedown-drain shape: a drain of N queued requests must not create
    * N versions, or the post-drain prune outruns the reader-grace
    * window — see `IngestDedup.maintain`). Per-request idempotence is
    * unchanged: already-applied deltaIds skip individually. False iff
    * nothing fresh was applied.
    */
  def deleteAll(art: VersionedArtifact, tables: Seq[String],
      reqs: Seq[(DataFrame, String)]): Boolean =
    art.admitAll(reqs.map { case (ids, deltaId) =>
      val col0 = ids.columns.head
      deltaId -> ((next: File) =>
        ids.select(col(col0).cast("long").as("id")).distinct()
          .coalesce(1)
          .write.mode("append")
          .parquet(new File(next, Table).getAbsolutePath))
    }, tables)

  /** The current version's tombstone set as a `(id)` frame, if any.
    * Standalone pointer read — readers pairing tombstones with TABLE
    * paths must derive both from one `snapshot` ([[fromSnapshot]])
    * instead, or a concurrent purge yields pre-purge tables with no
    * filter.
    */
  def loadTombstones(spark: SparkSession,
      art: VersionedArtifact): Option[DataFrame] =
    if (art.isManifestCurrent)
      fromFiles(spark, art.snapshotLogical(Nil, Table).extraFiles)
    else art.extraPath(Table).map(d => spark.read.parquet(d.getAbsolutePath))

  /** The tombstone frame from an explicit parquet FILE list (the
    * manifest carrier's resolution — a carried sidecar has no physical
    * dir in the current version). None = no sidecar.
    */
  def fromFiles(spark: SparkSession, files: Seq[File]): Option[DataFrame] =
    if (files.isEmpty) None
    else Some(spark.read.parquet(files.map(_.getAbsolutePath): _*))

  /** The tombstone frame out of an already-resolved version snapshot —
    * the same pointer read that resolved the table paths.
    */
  def fromSnapshot(spark: SparkSession,
      snap: graft.streaming.ArtifactSnapshot): Option[DataFrame] =
    snap.extra.map(d => spark.read.parquet(d.getAbsolutePath))

  /** |tombstone rows| / |`idTable` rows| for the current version, both
    * sides from ONE snapshot — the auto-purge policy's trigger metric.
    * Parquet-footer counts only (a bare count answers from row-group
    * metadata), no data pages read. The numerator counts sidecar ROWS:
    * an id tombstoned under two deltaIds counts twice — a small
    * overcount that only makes purge fire EARLIER, never miss. 0 with
    * no sidecar; an empty id table with live tombstones reads as 1
    * (purge overdue by definition).
    */
  def ratio(spark: SparkSession, art: VersionedArtifact,
      idTable: String): Double =
    if (art.isManifestCurrent) {
      val snap = art.snapshotLogical(Seq(idTable), Table)
      fromFiles(spark, snap.extraFiles) match {
        case None => 0.0
        case Some(t) =>
          // skip `_l0/` accrual rels: the link branch's directory read
          // never sees them, so counting them here would drift the
          // denominator across carriers if an idTable ever gained L0
          // accrual (none does today — r20 ADVICE hardening)
          val corpus = fromFiles(spark,
            snap.tableFiles(idTable)
              .filterNot(_._1.contains("/_l0/")).map(_._2))
            .map(_.count()).getOrElse(0L)
          if (corpus == 0L) 1.0 else t.count().toDouble / corpus
      }
    } else {
      val snap = art.snapshot(Seq(idTable), Table)
      fromSnapshot(spark, snap) match {
        case None => 0.0
        case Some(t) =>
          val corpus = spark.read.parquet(snap.paths(idTable)).count()
          if (corpus == 0L) 1.0 else t.count().toDouble / corpus
      }
    }

  /** The 5-digit bucket names holding tombstoned rows in a table
    * bucketed BY its id column — the same `pmod(murmur3, n)` the
    * bucketed writer computes (see `IndexLayout.writeInto`), evaluated
    * over the tombstone set, so a purge can rewrite ONLY those buckets
    * and hard-link the rest. The collect is bounded by
    * min(|tombstones|, buckets).
    */
  def affectedBuckets(tomb: DataFrame, buckets: Int): Set[String] =
    tomb.select(pmod(hash(col("id")), lit(buckets)).as("b")).distinct()
      .collect().map(r => f"${r.getInt(0)}%05d").toSet

  /** Drop every pair touching a tombstoned id on ANY of `idCols`. The
    * tombstone side broadcasts (deletion-bounded by contract); `None`
    * returns `pairs` untouched — zero plan cost for artifacts that never
    * saw a delete.
    */
  def filterPairs(pairs: DataFrame, tomb: Option[DataFrame],
      idCols: String*): DataFrame =
    tomb.fold(pairs) { t =>
      val ids = broadcast(t.select(col("id").as("__graft_tomb")))
      idCols.foldLeft(pairs)((d, c) =>
        d.join(ids, col(c) === col("__graft_tomb"), "left_anti"))
    }
}
