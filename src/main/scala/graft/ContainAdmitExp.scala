package graft

import org.apache.spark.sql.functions._

import graft.analytics.ContainIndex

/** Scratch measurement (r19): decompose the `q_dedup_containment_admitted`
  * premium over its incremental twin — is it the TWO-SEGMENT artifact's
  * probe (build files + admission accrual per table), and does a forced
  * bucket-granular compaction restore probe parity? Feeds the SCALE.md
  * admitted-face pricing note.
  *
  *   tools/run_main.sh graft.ContainAdmitExp /root/testdata/sf0.1
  */
object ContainAdmitExp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-containexp")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val docs = GraftSession.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val delta = docs.filter(col("doc_id") % 5 === 4)
    val sent = new HostSentinels.Warmed
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[exp] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        f"rows=$n  [${sent.line()}]")
    }
    val idxI = java.nio.file.Files.createTempDirectory("exp-ci").toString
    time("build incremental") {
      ContainIndex.build(spark, docs.filter(col("doc_id") % 5 =!= 4), idxI); 0L
    }
    val idxA = java.nio.file.Files.createTempDirectory("exp-ca").toString
    time("build 2-step base") {
      ContainIndex.build(spark, docs.filter(col("doc_id") % 5 < 3), idxA); 0L
    }
    time("append day1") {
      ContainIndex.append(spark, docs.filter(col("doc_id") % 5 === 3),
        idxA, "d1"); 0L
    }
    for (i <- 1 to 3) time(s"probe incremental $i") {
      ContainIndex.probe(spark, idxI, delta).count()
    }
    for (i <- 1 to 3) time(s"probe admitted $i") {
      ContainIndex.probe(spark, idxA, delta).count()
    }
    time("compact admitted (forced)") {
      ContainIndex.compact(spark, idxA, maxFiles = -64).toLong
    }
    for (i <- 1 to 3) time(s"probe admitted+compact $i") {
      ContainIndex.probe(spark, idxA, delta).count()
    }
    spark.stop()
  }
}
