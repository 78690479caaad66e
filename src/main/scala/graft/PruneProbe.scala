package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Measures what regime 2 (uncached + prunable — the 100 TB steady
  * state) actually BUYS: the same micro candidate job over the same
  * corpus band table, with the bucket-pruning INSET applied vs
  * declined, compared on INPUT BYTES READ and files touched (the
  * honest scale proxy — at sandbox corpus sizes wall clock is
  * noise-bound, but bytes/files scale linearly to the 100 TB claim:
  * a pruned probe reads ~selected/total of the table regardless of
  * its absolute size).
  *
  * Builds the text index over a `ScaleStress` 10× corpus with a
  * corpus-scale bucket count pinned (1024 — what ~32 GB of band table
  * would auto-size to at the 32 MB/bucket index target), probes a
  * small admission-bounded batch (40 docs × 32 bands ≤ 8 × 1024 keys
  * clears [[graft.analytics.IndexLayout.pruned]]'s gate), and runs the
  * candidate job twice: pruned (the real plan) and with the gate
  * force-declined (`buckets` metadata zeroed — the exact regime-3
  * plan). Prints both legs' bytes/files/wall plus the expected
  * selected-bucket fraction 1−e^(−k/n) next to the measured one.
  *
  *   sbt "runMain graft.PruneProbe /root/testdata/sf0.1"
  */
object PruneProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-pruneprobe")
    import spark.implicits._

    val bytesRead = new AtomicLong(0)
    val recordsRead = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
        recordsRead.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
        ()
      }
    })

    val tenxDir = java.nio.file.Files
      .createTempDirectory("graft-pruneprobe-10x").toString
    ScaleStress.generate(spark, dir, tenxDir, 10)
    val docs = spark.read.parquet(s"$tenxDir/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = docs.filter(!($"doc_id" < 1000000000L && $"doc_id" % 5 === 4))

    val idx = java.nio.file.Files
      .createTempDirectory("graft-pruneprobe-idx").toString
    val buckets = 1024
    graft.analytics.DedupIndex.build(spark, corpus, idx, buckets = buckets)
    val loaded = graft.analytics.DedupIndex.load(spark, idx)

    def leg(label: String, l: graft.analytics.DedupIndex.Loaded,
        deltaPer: org.apache.spark.sql.DataFrame): Unit = {
      val cand = graft.analytics.DedupIndex.microCandidates(l, deltaPer)
      bytesRead.set(0); recordsRead.set(0)
      val t0 = System.nanoTime()
      val n = cand.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are posted async; give the bus a beat to drain
      Thread.sleep(500)
      val plan = cand.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan).map(m => s"${m.group(1)}/${m.group(2)}")
        .getOrElse("-")
      println(f"[pruneprobe] $label%-8s candidates=$n%4d " +
        f"selected=$sel%-11s bytes=${bytesRead.get() / 1e6}%8.2f MB " +
        f"records=${recordsRead.get()}%9d wall=$sec%.2f s")
    }

    // the declined leg's plan: zeroed bucket metadata fails the
    // 8-keys/bucket gate — the exact regime-3 full-scan shape over the
    // SAME files, the per-k baseline
    val declined = loaded.copy(buckets = loaded.buckets.map {
      case (t, _) => t -> 0
    })
    // batch-size sweep: ids ≡ 4 (mod 5) below 5k (k docs each — the
    // admission-control knob a production stream turns)
    for (k <- Seq(8, 40, 400)) {
      val batch = docs.filter($"doc_id" % 5 === 4 && $"doc_id" < 5L * k)
      val deltaPer = graft.analytics.DedupQueries
        .signaturesOf(batch, loaded.shape.slots).persist()
      val keys = deltaPer.count() * loaded.shape.bands
      val expect = 1 - math.exp(-keys.toDouble / buckets)
      println(f"[pruneprobe] batch=$k%4d docs, keys=$keys%6d, " +
        f"expected selected fraction 1-e^(-k/n) = $expect%.3f")
      leg("pruned", loaded, deltaPer)
      leg("declined", declined, deltaPer)
      deltaPer.unpersist()
      ()
    }
    spark.stop()
  }
}
