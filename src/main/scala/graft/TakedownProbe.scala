package graft

import java.io.File

import org.apache.spark.sql.functions._

/** Measures the two-phase deletion's cost claims
  * ([[graft.analytics.IndexTombstones]]; SCALE.md round-16 takedown
  * section) on a [[ScaleStress]]-scaled corpus:
  *
  *   1. LOGICAL delete is O(ids): the tombstone admission wall.
  *   2. The probe filter is O(pairs): probe wall before vs after the
  *      delete (same delta, same artifact content).
  *   3. PHYSICAL purge is bucket-selective where the bucket key is the
  *      id: per-table rewritten-vs-linked file counts and bytes, plus
  *      the purge wall. `signatures` must rewrite ≈ |tombstones|
  *      buckets; `bands` rewrites whole (inherent — band-keyed).
  *
  *   sbt "runMain graft.TakedownProbe /root/testdata/sf0.1 10 16"
  *   (sfDir, corpus copies, deleted ids)
  */
object TakedownProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val nDelete = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, "graft-takedown")
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t) / 1e9)
    }

    val bigDir = java.nio.file.Files
      .createTempDirectory(s"graft-takedown-${copies}x").toString
    ScaleStress.generate(spark, dir, bigDir, copies)
    val docs = spark.read.parquet(s"$bigDir/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = docs.filter($"doc_id" % 5 =!= 4)
    val delta = docs.filter($"doc_id" % 5 === 4 && $"doc_id" < 1000000000L)

    val idx = java.nio.file.Files
      .createTempDirectory("graft-takedown-idx").toString
    val (_, buildS) = timed(
      graft.analytics.DedupIndex.build(spark, corpus, idx))
    println(f"[takedown] ${copies}x build=$buildS%.1f s " +
      f"(${graft.analytics.DedupIndex.artifactBytes(idx) / 1e6}%.0f MB)")

    val (before, probe0S) = timed(
      graft.analytics.DedupIndex.probe(spark, idx, delta).count())

    // delete the first nDelete corpus ids that actually pair (worst
    // case for the filter: every tombstone is load-bearing)
    val matched = graft.analytics.DedupIndex.probe(spark, idx, delta)
      .select($"corpus_id").distinct()
      .orderBy($"corpus_id").limit(nDelete)
    val (_, delS) = timed(graft.analytics.DedupIndex.delete(
      spark, idx, matched, "takedown-probe"))
    val (after, probe1S) = timed(
      graft.analytics.DedupIndex.probe(spark, idx, delta).count())
    println(f"[takedown] delete($nDelete ids)=$delS%.2f s; probe " +
      f"before=$probe0S%.2f s ($before pairs) after=$probe1S%.2f s " +
      f"($after pairs)")

    def tableFiles(ver: File, t: String): Seq[File] =
      Option(new File(ver, t).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq
    def currentVer(): File = new File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .maxBy(_.getName.stripPrefix("v").toLong)

    val preVer = currentVer()
    val (_, purgeS) = timed(graft.analytics.DedupIndex.purge(spark, idx))
    val postVer = currentVer()
    for (t <- Seq("signatures", "bands")) {
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
    val (afterPurge, probe2S) = timed(
      graft.analytics.DedupIndex.probe(spark, idx, delta).count())
    println(f"[takedown] purge wall=$purgeS%.1f s; probe after " +
      f"purge=$probe2S%.2f s ($afterPurge pairs, must equal $after)")
    spark.stop()
  }
}
