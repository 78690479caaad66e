package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{IngestDedup, IngestDoc}

/** Measures the reader-side cost of a budget-sliced purge — the
  * purge-equivalence skip's claim (SCALE.md round-18) at the 100×
  * rehearsal shape: a PROBE-ONLY cached reader stream over the text
  * artifact, driven through a takedown and a multi-slice out-of-band
  * purge, printing every reader batch's wall and the artifact load
  * count. With the skip, the reader pays one reload for the takedown
  * (its filter must apply) and one at purge completion — per-SLICE
  * batches stay at the cached steady state. Without it, every slice's
  * version bump forced a corpus-sized reload + re-persist (the
  * `LoopStress` text batch-1 cost, ~15 s at 100×) — per slice, per
  * reader.
  *
  *   sbt "runMain graft.ReaderChurnProbe /root/testdata/sf0.1 100 16 8"
  *   (sfDir, corpus copies, deleted ids, purge budget)
  */
object ReaderChurnProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(100)
    val nDelete = args.lift(2).map(_.toInt).getOrElse(16)
    val budget = args.lift(3).map(_.toInt).getOrElse(8)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, "graft-readerchurn")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.VectorFunctions.register(spark)
    val sent = new HostSentinels.Warmed

    val big = java.nio.file.Files
      .createTempDirectory(s"graft-rchurn-${copies}x").toString
    ScaleStress.generate(spark, dir, big, copies)
    val docs = GraftSession.table(spark, big, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-rchurn-idx").toString
    var t0 = System.nanoTime()
    graft.analytics.DedupIndex.build(spark,
      docs.filter($"doc_id" % 5 =!= 4), idx)
    println(f"[rchurn] build=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      f"(${graft.analytics.DedupIndex.artifactBytes(idx) >> 20} MB)  " +
      s"[${sent.line()}]")

    // micro-batch-sized reader batches (the streaming contract's
    // admission-bounded shape, same as LoopStress) — the probe is about
    // RELOAD churn, so the per-batch probe work must stay small enough
    // that a corpus-sized reload would dominate it
    val delta = docs.filter($"doc_id" % 5 === 4)
      .orderBy($"doc_id").limit(125)
      .as[IngestDoc].collect().sortBy(_.doc_id).toSeq
    val input = MemoryStream[IngestDoc]
    val loads0 = graft.analytics.DedupIndex.loadRuns.get()
    var pairs = 0L
    val q = IngestDedup.dedupIngestFromIndex(input.toDS(), idx,
      java.nio.file.Files.createTempDirectory("graft-rchurn-ck").toString) {
        (p, _) => pairs = p.count()
      }
    def loads() = graft.analytics.DedupIndex.loadRuns.get() - loads0
    def feed(label: String): Double = {
      val t = System.nanoTime()
      input.addData(delta); q.processAllAvailable()
      val w = (System.nanoTime() - t) / 1e9
      println(f"[rchurn] $label%-22s wall=$w%6.2f s loads=${loads()} " +
        f"pairs=$pairs")
      w
    }
    try {
      feed("batch cold")
      val steady = (1 to 3).map(i => feed(s"batch steady $i"))
      // takedown: corpus-side ids drawn from the live pairs
      val dropIds = spark.read.parquet(s"$idx/v0/signatures")
        .select($"doc_id").filter($"doc_id" % 7 === 3)
        .limit(nDelete).collect().map(_.getLong(0)).toSeq
      assert(graft.analytics.DedupIndex.delete(spark, idx,
        dropIds.toDF("doc_id"), "rchurn-td"))
      feed("batch post-takedown")  // must reload once (filter applies)
      val loadsAfterTd = loads()
      // sliced purge, out of band (the writer seat elsewhere); reader
      // batches interleave with slices
      var slices = 0
      val sliceWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
      t0 = System.nanoTime()
      var pending = true
      while (pending && slices < 64) {
        graft.analytics.DedupIndex.purge(spark, idx, budget)
        slices += 1
        pending = graft.analytics.DedupIndex.purgePending(idx)
        if (pending) sliceWalls += feed(s"batch during slice $slices")
      }
      val purgeWall = (System.nanoTime() - t0) / 1e9
      val loadsDuring = loads() - loadsAfterTd
      feed("batch post-completion")  // one reload onto the purged files
      println(f"[rchurn] summary: steady median=${
        steady.sorted.apply(steady.size / 2)}%.2f s, slices=$slices " +
        f"(purge wall=$purgeWall%.1f s), reader batches during purge: " +
        f"median=${if (sliceWalls.isEmpty) 0.0
          else sliceWalls.sorted.apply(sliceWalls.size / 2)}%.2f s, " +
        f"reloads during slices=$loadsDuring (claim: 0), " +
        f"total loads=${loads()} (claim: 3)  [${sent.line()}]")
    } finally q.stop()
    println(s"[rchurn] blackhole=${HostSentinels.blackhole}")
    spark.stop()
  }
}
