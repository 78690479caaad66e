package graft

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{IngestDedup, IngestDoc, IngestVec}

/** The 100×-SHAPE rehearsal of the full probe-then-admit loop (r15
  * verdict #6, extended to ALL THREE index faces by r16 verdict #2):
  * drive a face over a [[ScaleStress]]-synthesized `copies`× corpus at
  * PRODUCTION bucket auto-sizing and the DEFAULT cache policy, and
  * report, per batch: wall, match count, the probe's
  * `SelectedBucketsCount` (regime-2 evidence — bucket-pruned reads
  * engaging in the steady state), and whether the corpus frames were
  * persisted (the cache-if-fits decision). Run it at two copy counts
  * and the regime FLIPS at the measured byte threshold: below the
  * session's storage budget (printed) probe-only streams run cached;
  * past it they fall to the uncached-prunable regime — the only option
  * at 100 TB — and the per-batch medians must stay near-flat anyway,
  * because every probe reads ~(1 − e^(−keys/buckets)) of the table,
  * not all of it.
  *
  * Two legs per run, like `IngestProbe` but at rehearsal scale:
  * probe-only (fresh checkpoint), then probe-then-admit (fresh
  * checkpoint + rebuilt artifact; `compactEvery = 4` seats in-loop
  * compaction so the rehearsal also exercises maintenance — including
  * the bucket-granular fold on EVERY table of the face, the
  * containment family's four included — under load).
  *
  *   sbt "runMain graft.LoopStress /root/testdata/sf0.1 100 8 text"
  *   faces: text (DedupIndex) | contain (ContainIndex, 4 tables)
  *        | embed (SrpIndex)
  */
object LoopStress {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(100)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(8)
    val face = args.lift(3).getOrElse("text")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, "graft-loopstress")
    import spark.implicits._
    // the contain/embed faces use graft_* kernels (sorted_and_count,
    // srp_sig, …) that the oracled entry points normally register
    graft.functions.VectorFunctions.register(spark)

    val t0 = System.nanoTime()
    val bigDir = java.nio.file.Files
      .createTempDirectory(s"graft-loopstress-${copies}x").toString
    ScaleStress.generate(spark, dir, bigDir, copies)
    println(f"[loopstress] $face ${copies}x corpus generated in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    val idx = java.nio.file.Files
      .createTempDirectory(s"graft-loopstress-idx").toString

    face match {
      case "text" =>
        val docs = spark.read.parquet(s"$bigDir/documents.parquet")
          .select($"doc_id", $"text")
        val isDelta = $"doc_id" < 1000000000L && $"doc_id" % 5 === 4
        val corpus = docs.filter(!isDelta)
        val delta = docs.filter(isDelta).as[IngestDoc]
          .collect().sortBy(_.doc_id).toSeq
        run[IngestDoc](spark, copies, nBatches, delta,
          () => graft.analytics.DedupIndex.build(spark, corpus, idx),
          () => graft.analytics.DedupIndex.artifactBytes(idx),
          (in, ck, admit, sink) => IngestDedup.dedupIngestFromIndex(
            in, idx, ck, admitId = admit,
            compactEvery = if (admit.isDefined) 4 else 0)(sink))
      case "contain" =>
        val docs = spark.read.parquet(s"$bigDir/documents.parquet")
          .select($"doc_id", $"text")
        val isDelta = $"doc_id" < 1000000000L && $"doc_id" % 5 === 4
        val corpus = docs.filter(!isDelta)
        val delta = docs.filter(isDelta).as[IngestDoc]
          .collect().sortBy(_.doc_id).toSeq
        run[IngestDoc](spark, copies, nBatches, delta,
          () => graft.analytics.ContainIndex.build(spark, corpus, idx),
          () => graft.analytics.ContainIndex.artifactBytes(idx),
          (in, ck, admit, sink) => IngestDedup.dedupIngestContainment(
            in, idx, ck, admitId = admit,
            compactEvery = if (admit.isDefined) 4 else 0)(sink))
      case "embed" =>
        val vecs = spark.read.parquet(s"$bigDir/embeddings.parquet")
          .select($"vec_id", $"embedding")
        val isDelta = $"vec_id" < 1000000000L && $"vec_id" % 5 === 4
        val corpus = vecs.filter(!isDelta)
        val delta = vecs.filter(isDelta).as[IngestVec]
          .collect().sortBy(_.vec_id).toSeq
        run[IngestVec](spark, copies, nBatches, delta,
          () => graft.analytics.SrpIndex.build(spark, corpus, idx),
          () => graft.analytics.SrpIndex.artifactBytes(idx),
          (in, ck, admit, sink) => IngestDedup.dedupIngestEmbeddings(
            in, idx, ck, admitId = admit,
            compactEvery = if (admit.isDefined) 4 else 0)(sink))
      case other => sys.error(s"unknown face $other (text|contain|embed)")
    }
    spark.stop()
  }

  /** Build the artifact, then the two legs — shared across faces. Every
    * printed measurement carries a [[HostSentinels]] pair: the contain
    * 100× probe-only median ranged 3.69–7.89 s on unchanged code across
    * r17 runs and SCALE.md could only attribute the swing to host
    * slow-tier reads by circumstance — now the record proves (or
    * indicts) the host itself.
    */
  private def run[T](spark: SparkSession, copies: Int, nBatches: Int,
      delta: Seq[T],
      build: () => Unit,
      artifactBytes: () => Long,
      open: (Dataset[T], String, Option[String],
        (DataFrame, Long) => Unit) => StreamingQuery)(
      implicit enc: Encoder[T]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val sent = new HostSentinels.Warmed
    // the SAME natural delta at every copy count (copy 0 is verbatim)
    val batches = (0 until nBatches).map(k => delta.iterator.zipWithIndex
      .filter(_._2 % nBatches == k).map(_._1).toSeq)

    def timedBuild(): Unit = {
      val t = System.nanoTime()
      build()
      println(f"[loopstress] index build=${(System.nanoTime() - t) / 1e9}%.1f s" +
        s"  [${sent.line()}]")
    }
    timedBuild()

    val artifactMb = artifactBytes() / 1e6
    val budgetMb = spark.conf
      .getOption("spark.graft.index.cache.maxBytes")
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(IngestDedup.storageBudget(
        spark.sparkContext.getExecutorMemoryStatus.toMap,
        spark.sparkContext.getConf.get("spark.driver.host", ""))) / 1e6
    println(f"[loopstress] artifact=${artifactMb}%.0f MB, session cache " +
      f"budget=${budgetMb}%.0f MB -> expected regime: " +
      (if (artifactMb <= budgetMb) "CACHED (fits)" else "UNCACHED-PRUNABLE"))

    /** One leg: per-batch (wall s, matches, selected-buckets). */
    def leg(tag: String, admit: Boolean): Unit = {
      val results = scala.collection.mutable.ArrayBuffer
        .empty[(Double, Long, String)]
      val input = MemoryStream[T]
      val ck = java.nio.file.Files
        .createTempDirectory(s"graft-loopstress-ck-$tag").toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      val q = open(input.toDS(), ck,
        if (admit) Some(s"loop-$tag") else None,
        (pairs, _) => {
          val n = pairs.count()
          val plan = pairs.queryExecution.executedPlan.toString
          val s = sel.findFirstMatchIn(plan)
            .map(m => s"${m.group(1)}/${m.group(2)}").getOrElse("-")
          results += ((0.0, n, s)); ()
        })
      // sample the cache-if-fits decision BEFORE stop(): the stream's
      // cache lifecycle releases its entries on stop, so a post-stop
      // read always says false
      var cached = false
      try batches.foreach { b =>
        val t = System.nanoTime()
        input.addData(b); q.processAllAvailable()
        val last = results.last
        results(results.length - 1) =
          ((System.nanoTime() - t) / 1e9, last._2, last._3)
        cached = spark.sparkContext.getRDDStorageInfo.nonEmpty
      } finally q.stop()
      val steady = results.tail.map(_._1).sorted
      println(f"[loopstress] $tag%-12s ${copies}%4dx: " +
        f"batch1=${results.head._1}%.2f s " +
        f"steady median=${steady(steady.length / 2)}%.2f s " +
        f"(${results.tail.map(r => f"${r._1}%.2f").mkString("/")}) " +
        f"matches=${results.map(_._2).sum} " +
        f"selected=${results.map(_._3).distinct.mkString(",")} " +
        f"cached=$cached  [${sent.line()}]")
    }

    leg("probe", admit = false)
    timedBuild() // fresh artifact: the probe leg didn't admit, keep parity
    leg("probe+admit", admit = true)
  }
}
