package graft

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{IngestDedup, IngestDoc, IngestVec, TakedownQueue}

/** Measures the two-phase deletion's cost claims for EVERY index family
  * ([[graft.analytics.IndexTombstones]]; SCALE.md takedown section) on a
  * [[ScaleStress]]-scaled corpus:
  *
  *   1. LOGICAL delete is O(ids): the tombstone admission wall.
  *   2. The probe filter is O(pairs): probe wall before vs after the
  *      delete (same delta, same artifact content).
  *   3. PHYSICAL purge is bucket-selective where the bucket key is the
  *      id: per-table rewritten-vs-linked file counts and bytes, plus
  *      the purge wall. Priced honestly per family: dedup `signatures`
  *      and srp `vectors` rewrite ≈ |tombstones| buckets; contain
  *      `sets` likewise; band/posting tables (dedup `bands`, srp
  *      `bands`, contain `tokens`/`prefix`) rewrite whole — inherent,
  *      they are keyed by band/token hash, not doc id; contain `df`
  *      carries as links (frozen-df contract).
  *   4. PURGE UNDER A RUNNING STREAM: an admitting stream with a
  *      [[TakedownQueue]] and the auto-purge threshold floored — the
  *      batch that drains the takedown carries delete + ONE budgeted
  *      purge slice from the writer seat, and every following batch
  *      continues a slice until the sidecar drops; each batch's wall
  *      prints next to the plain admitting batch's (the r18 acceptance
  *      bar: no batch ~2× over its plain-admit neighbor).
  *
  * Every measured leg prints a [[HostSentinels]] pair — the record
  * attributes its own noise (in-band sentinels = the number is the
  * code's; high sentinels = the host was loaded), same as `Bench`.
  *
  *   sbt "runMain graft.TakedownProbe /root/testdata/sf0.1 10 16 dedup"
  *   (sfDir, corpus copies, deleted ids, family: dedup|srp|contain)
  */
object TakedownProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val nDelete = args.lift(2).map(_.toInt).getOrElse(16)
    val family = args.lift(3).getOrElse("dedup")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, "graft-takedown")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // srp/contain faces use graft_* kernels the oracled entry points
    // normally register
    graft.functions.VectorFunctions.register(spark)
    val sent = new HostSentinels.Warmed

    def timed[A](f: => A): (A, Double) = {
      val t = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t) / 1e9)
    }

    val bigDir = java.nio.file.Files
      .createTempDirectory(s"graft-takedown-${copies}x").toString
    ScaleStress.generate(spark, dir, bigDir, copies)
    val idx = java.nio.file.Files
      .createTempDirectory("graft-takedown-idx").toString

    // family wiring: source frame, id column, build/probe/delete/purge,
    // tables to audit, and the streaming face for leg 4
    val (src, idCol, tables) = family match {
      case "srp" => (spark.read.parquet(s"$bigDir/embeddings.parquet")
        .select($"vec_id", $"embedding"), "vec_id",
        Seq("vectors", "bands"))
      case "contain" => (spark.read.parquet(s"$bigDir/documents.parquet")
        .select($"doc_id", $"text"), "doc_id",
        Seq("tokens", "prefix", "sets", "df"))
      case _ => (spark.read.parquet(s"$bigDir/documents.parquet")
        .select($"doc_id", $"text"), "doc_id", Seq("signatures", "bands"))
    }
    val isDelta = col(idCol) % 5 === 4 && col(idCol) < 1000000000L
    val corpus = src.filter(!isDelta)
    val delta = src.filter(isDelta)

    def build(): Unit = family match {
      case "srp" => graft.analytics.SrpIndex.build(spark, corpus, idx)
      case "contain" => graft.analytics.ContainIndex.build(spark, corpus, idx)
      case _ => graft.analytics.DedupIndex.build(spark, corpus, idx)
    }
    def probe(): DataFrame = family match {
      case "srp" => graft.analytics.SrpIndex.probe(spark, idx, delta)
      case "contain" => graft.analytics.ContainIndex.probe(spark, idx, delta)
      case _ => graft.analytics.DedupIndex.probe(spark, idx, delta)
    }
    def delete(ids: DataFrame, d: String): Boolean = family match {
      case "srp" => graft.analytics.SrpIndex.delete(spark, idx, ids, d)
      case "contain" => graft.analytics.ContainIndex.delete(spark, idx, ids, d)
      case _ => graft.analytics.DedupIndex.delete(spark, idx, ids, d)
    }
    def purge(): Boolean = family match {
      case "srp" => graft.analytics.SrpIndex.purge(spark, idx)
      case "contain" => graft.analytics.ContainIndex.purge(spark, idx)
      case _ => graft.analytics.DedupIndex.purge(spark, idx)
    }
    def artifactMb: Double = (family match {
      case "srp" => graft.analytics.SrpIndex.artifactBytes(idx)
      case "contain" => graft.analytics.ContainIndex.artifactBytes(idx)
      case _ => graft.analytics.DedupIndex.artifactBytes(idx)
    }) / 1e6

    val (_, buildS) = timed(build())
    println(f"[takedown] $family ${copies}x build=$buildS%.1f s " +
      f"($artifactMb%.0f MB)  [${sent.line()}]")

    val (before, probe0S) = timed(probe().count())

    // delete the first nDelete CORPUS-side ids that actually pair
    // (worst case for the filter: every tombstone is load-bearing);
    // the containment face reports the corpus doc on either side, so
    // select by non-delta membership, not by column position
    val pairs = probe()
    val a = pairs.columns(0); val b = pairs.columns(1)
    val matched = pairs.select(explode(array(col(a), col(b))).as(idCol))
      .filter(!isDelta).distinct().orderBy(col(idCol)).limit(nDelete)
    val (_, delS) = timed(delete(matched, "takedown-probe"))
    val (after, probe1S) = timed(probe().count())
    println(f"[takedown] delete($nDelete ids)=$delS%.2f s; probe " +
      f"before=$probe0S%.2f s ($before pairs) after=$probe1S%.2f s " +
      f"($after pairs)  [${sent.line()}]")

    def tableFiles(ver: File, t: String): Seq[File] =
      Option(new File(ver, t).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq
    def currentVer(): File = new File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .maxBy(_.getName.stripPrefix("v").toLong)

    val preVer = currentVer()
    val (_, purgeS) = timed(purge())
    val postVer = currentVer()
    for (t <- tables) {
      val post = tableFiles(postVer, t)
      val (linked, rewritten) = post.partition { f =>
        val old = new File(preVer, s"$t/${f.getName}")
        old.exists() &&
          java.nio.file.Files.isSameFile(f.toPath, old.toPath)
      }
      println(f"[takedown] purge $t%-10s: rewritten=${rewritten.length}%4d " +
        f"files ${rewritten.map(_.length).sum / 1e6}%8.1f MB, " +
        f"linked=${linked.length}%4d files " +
        f"${linked.map(_.length).sum / 1e6}%8.1f MB")
    }
    val (afterPurge, probe2S) = timed(probe().count())
    println(f"[takedown] purge wall=$purgeS%.1f s; probe after " +
      f"purge=$probe2S%.2f s ($afterPurge pairs, must equal $after)  " +
      s"[${sent.line()}]")

    // leg 4: purge ON A RUNNING STREAM — rebuild (clean artifact, no
    // tombstones), floor the auto-purge threshold, admit one batch,
    // queue a takedown, and time the draining batch (delete + one
    // BUDGETED purge slice at the writer seat) against the plain
    // admitting batch before it; then keep admitting small id-shifted
    // batches, each continuing one slice, until the sidecar drops
    build()
    spark.conf.set("spark.graft.index.purge.ratio", "0.0000001")
    val tq = new TakedownQueue
    val half = nDelete / 2 max 1
    val dropIds = matched.limit(half).collect().map(_.getLong(0)).toSeq
    def purgePending(): Boolean = family match {
      case "srp" => graft.analytics.SrpIndex.purgePending(idx)
      case "contain" => graft.analytics.ContainIndex.purgePending(idx)
      case _ => graft.analytics.DedupIndex.purgePending(idx)
    }
    def batchWalls(): Seq[Double] = family match {
      case "srp" =>
        val b = delta.select(col(idCol), col("embedding")).as[IngestVec]
          .collect().sortBy(_.vec_id).toSeq
        runStream[IngestVec](b, tq, dropIds, purgePending _,
          (v, s) => v.copy(vec_id = v.vec_id + s),
          (in, ck) => IngestDedup.dedupIngestEmbeddings(in, idx, ck,
            admitId = Some("td-stream"), takedowns = Some(tq))(
            (p, _) => { p.count(); () }))
      case "contain" =>
        val b = delta.select(col(idCol), col("text")).as[IngestDoc]
          .collect().sortBy(_.doc_id).toSeq
        runStream[IngestDoc](b, tq, dropIds, purgePending _,
          (d, s) => d.copy(doc_id = d.doc_id + s),
          (in, ck) => IngestDedup.dedupIngestContainment(in, idx, ck,
            admitId = Some("td-stream"), takedowns = Some(tq))(
            (p, _) => { p.count(); () }))
      case _ =>
        val b = delta.select(col(idCol), col("text")).as[IngestDoc]
          .collect().sortBy(_.doc_id).toSeq
        runStream[IngestDoc](b, tq, dropIds, purgePending _,
          (d, s) => d.copy(doc_id = d.doc_id + s),
          (in, ck) => IngestDedup.dedupIngestFromIndex(in, idx, ck,
            admitId = Some("td-stream"), takedowns = Some(tq))(
            (p, _) => { p.count(); () }))
    }
    val walls = batchWalls()
    val sidecarGone = !new File(currentVer(), "tombstones").exists()
    val cont = walls.drop(3)
    println(f"[takedown] stream: admit batch=${walls(0)}%.2f s, " +
      f"admit+drain+slice batch=${walls(1)}%.2f s, " +
      f"post batch=${walls(2)}%.2f s, " +
      s"continuation slices=${cont.size} " +
      s"(${cont.map(w => f"$w%.2f").mkString("/")}), " +
      f"max/admit ratio=${walls.tail.max / walls(0)}%.2f, " +
      s"sidecar dropped=$sidecarGone  [${sent.line()}]")
    spark.stop()
  }

  /** Batches: plain admit, admit + drained takedown (budgeted auto-purge
    * fires its first slice — threshold floored by the caller), plain
    * admit, then small continuation batches (id-shifted by `shift`)
    * while a sliced purge is pending, capped. Returns every batch wall.
    */
  private def runStream[T](delta: Seq[T], tq: TakedownQueue,
      dropIds: Seq[Long], purgePending: () => Boolean,
      shift: (T, Long) => T,
      open: (org.apache.spark.sql.Dataset[T], String) =>
        org.apache.spark.sql.streaming.StreamingQuery)(
      implicit enc: org.apache.spark.sql.Encoder[T],
      sqlCtx: org.apache.spark.sql.SQLContext): Seq[Double] = {
    // the caller prints walls(0..2) as admit / drain / post batches — with
    // fewer than 3 delta rows grouped() yields fewer batches and the print
    // would die on an opaque IndexOutOfBounds instead of the real problem
    require(delta.size >= 3,
      s"stream leg needs >= 3 delta rows to form its 3 batches, got ${delta.size}")
    val thirds = delta.grouped((delta.size + 2) / 3).toSeq
    val input = MemoryStream[T]
    val ck = java.nio.file.Files
      .createTempDirectory("graft-takedown-ck").toString
    val q = open(input.toDS(), ck)
    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    def feed(b: Seq[T]): Unit = {
      val t = System.nanoTime()
      input.addData(b); q.processAllAvailable()
      walls += (System.nanoTime() - t) / 1e9
    }
    try {
      thirds.zipWithIndex.foreach { case (b, i) =>
        if (i == 1) tq.request(dropIds, "takedown-stream-1")
        feed(b)
      }
      // continuation: the sliced purge advances one slice per batch; a
      // quiet stream would stall it, so keep small admissions coming
      // (id-shifted — re-sending ids would admit duplicate rows). Cap
      // well past any plausible slice count so a bug can't loop forever.
      var k = 0
      while (purgePending() && k < 64) {
        k += 1
        feed(delta.take(8).map(shift(_, 995000000L + 10000L * k)))
      }
    } finally q.stop()
    walls.toSeq
  }
}
