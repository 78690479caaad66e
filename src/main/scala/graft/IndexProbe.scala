package graft

import org.apache.spark.sql.functions._

/** Measurement probe for the durable dedup-index lifecycle
  * ([[graft.analytics.DedupIndex]]; SCALE.md durable-index rows): times
  * build (corpus = doc_id % 5 < 3), one admission (day1 = % 5 == 3,
  * probe-then-admit), and a post-admission probe (day2 = % 5 == 4)
  * against a corpus dir, and reports the admitted version's file
  * economics (hard-linked carries vs newly written part files — the
  * O(|delta|)-write claim, counted rather than asserted).
  *
  *   sbt "runMain graft.IndexProbe /root/testdata/sf0.1"
  */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-indexprobe")
    import spark.implicits._
    val docs = GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files.createTempDirectory("graft-idxprobe")
      .toString
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[indexprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    timed("build (3/5 corpus)") {
      graft.analytics.DedupIndex.build(spark, docs.filter($"doc_id" % 5 < 3), idx)
    }
    val day1 = docs.filter($"doc_id" % 5 === 3)
    val probe1 = timed("probe day1 (pre-admit)") {
      graft.analytics.DedupIndex.probe(spark, idx, day1).count()
    }
    timed("admit day1") {
      graft.analytics.DedupIndex.append(spark, day1, idx, "day1")
    }
    val probe2 = timed("probe day2 (post-admit)") {
      graft.analytics.DedupIndex
        .probe(spark, idx, docs.filter($"doc_id" % 5 === 4)).count()
    }
    println(s"[indexprobe] pairs: day1=$probe1 day2=$probe2")
    // file economics of the admitted version: same inode = carried link
    val v0 = new java.io.File(idx, "v0")
    val v1 = new java.io.File(idx, "v1")
    def parts(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty).toSeq
        .flatMap(t => Option(t.listFiles()).getOrElse(Array.empty))
        .filter(_.getName.endsWith(".parquet"))
    val v0Parts = parts(v0).map(_.getName).toSet
    val (carried, fresh) = parts(v1).partition(f => v0Parts(f.getName))
    println(s"[indexprobe] v1 files: carried=${carried.size} " +
      s"(hard links) new=${fresh.size} (delta writes)")
    // ---- compaction economics: accrete small files with 6 more slice
    // admissions (the daily-ingest year-of-deltas shape), time the SAME
    // probe against the fat index, compact, re-time — the claim that
    // per-admission file accrual comes to dominate the probe, measured.
    val day2 = docs.filter($"doc_id" % 5 === 4)
    timed("admit day2 in 6 slices") {
      (0 until 6).foreach { k =>
        graft.analytics.DedupIndex.append(spark,
          day2.filter($"doc_id" % 6 === k), idx, s"day2-$k")
      }
    }
    def bandFiles: Int = Option(new java.io.File(
        graft.analytics.DedupIndex.tablePath(idx, "bands")).listFiles())
      .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    val fatFiles = bandFiles
    val fatPairs = timed(s"probe day1 vs FAT index ($fatFiles band files)") {
      graft.analytics.DedupIndex.probe(spark, idx, day1).count()
    }
    timed("compact") {
      graft.analytics.DedupIndex.compact(spark, idx, maxFiles = 8)
    }
    val slimFiles = bandFiles
    val slimPairs = timed(
        s"probe day1 vs COMPACTED index ($slimFiles band files)") {
      graft.analytics.DedupIndex.probe(spark, idx, day1).count()
    }
    println(s"[indexprobe] compact: band files $fatFiles -> $slimFiles, " +
      s"probe pairs $fatPairs -> $slimPairs (must be equal)")
    spark.stop()
  }
}
