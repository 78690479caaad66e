package graft.analytics

import org.apache.spark.sql.functions._

/** Per-stage wall breakdown of ONE bucketed containment micro batch —
  * the instrument for attributing the per-batch cost of the streaming
  * containment face (the other two faces' micro batches are sub-2 s;
  * this one's composition is the question).
  *
  *   sbt "runMain graft.analytics.MicroProbe /root/testdata/sf0.1"
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-microprobe")
    import spark.implicits._
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[microprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-microprobe").toString
    timed("build (bucketed)") {
      ContainIndex.build(spark, docs.filter($"doc_id" % 5 =!= 4), idx)
    }
    val loaded = timed("load")(ContainIndex.load(spark, idx))
    // one IngestProbe-sized micro batch: a fifth of the delta slice
    val batch = docs.filter($"doc_id" % 5 === 4 && $"doc_id" % 25 === 4)
      .persist()
    println(s"[microprobe] batch docs: ${batch.count()}")
    (1 to 3).foreach { i =>
      timed(s"batch $i: candidate frames collect") {
        val (n2oF, o2nF) = ContainIndex.microCandidateFrames(loaded, batch)
        val n2o = timed(s"batch $i:   n2o")(n2oF.collect())
        val o2n = timed(s"batch $i:   o2n")(o2nF.collect())
        println(s"[microprobe]   n2o=${n2o.length} o2n=${o2n.length}")
      }
      timed(s"batch $i: full probeLoaded(micro) count") {
        ContainIndex.probeLoaded(loaded, batch, micro = true).count()
      }
    }
    spark.stop()
  }
}
