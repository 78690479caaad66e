package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{IngestDedup, IngestDoc, IngestVec}

/** Measurement probe for the STREAMING ingest-dedup trio
  * ([[graft.streaming.IngestDedup]]; SCALE.md streaming-ingest rows):
  * per-micro-batch wall for the text (DedupIndex), containment
  * (ContainIndex), and embedding (SrpIndex) faces, with the SAME delta
  * batches probed against a 1× and a [[ScaleStress]]-synthesized 10×
  * corpus index — the claim under test is that steady-state per-batch
  * ingest cost is O(|batch| + matches), i.e. near-FLAT as the standing
  * corpus grows 10×, because every batch equi-joins the loaded artifact
  * instead of re-deriving corpus state.
  *
  * Batch 1 is reported separately: it pays the one-time artifact load
  * (and, when cache-if-fits persists the frames, the corpus-sized cache
  * materialization); batches 2+ are the steady state. Indexes are built
  * at the production defaults — since round 15 that means the BUCKETED
  * layout probed under the three-regime selection: at these artifact
  * sizes the default leg runs CACHED (frames persisted, lazy broadcast
  * plan), and the forced-uncached `-u` leg runs the pruned/parallel
  * scan regimes a 100 TB artifact lives in.
  *
  *   sbt "runMain graft.IngestProbe /root/testdata/sf0.1"
  */
object IngestProbe {

  private val Batches = 5

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-ingestprobe")
    import spark.implicits._

    val tenxDir = java.nio.file.Files
      .createTempDirectory("graft-ingestprobe-10x").toString
    ScaleStress.generate(spark, dir, tenxDir, 10)

    // the SAME delta at both scales: the original dir's % 5 == 4 slice
    // (ScaleStress keeps copy 0 verbatim, so these ids exist in both)
    val docs1 = GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val docs10 = spark.read.parquet(s"$tenxDir/documents.parquet")
      .select($"doc_id", $"text")
    val vecs1 = GraftSession.table(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
    val vecs10 = spark.read.parquet(s"$tenxDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val isDocDelta = $"doc_id" < 1000000000L && $"doc_id" % 5 === 4
    val isVecDelta = $"vec_id" < 1000000000L && $"vec_id" % 5 === 4
    val deltaDocs = docs1.filter($"doc_id" % 5 === 4)
      .as[IngestDoc].collect().sortBy(_.doc_id)
    val deltaVecs = vecs1.filter($"vec_id" % 5 === 4)
      .as[IngestVec].collect().sortBy(_.vec_id)

    def slices[A](all: Array[A]): Seq[Seq[A]] =
      (0 until Batches).map(k => all.iterator.zipWithIndex
        .filter(_._2 % Batches == k).map(_._1).toSeq)

    // self-attribution: every reported leg carries a HostSentinels pair
    // (in-band sentinels = the number is the code's; high = the host's)
    val sent = new HostSentinels.Warmed

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }

    /** A mid-leg batch wall this many × the leg's RUNNING median fires
      * an immediate sentinel pair (r18 verdict #3): the 6–12× one-batch
      * spikes the embed probe leg showed are invisible to leg-BOUNDARY
      * sentinels (the stall is over before the leg ends), and a
      * per-batch pair would cost more than the batches. Event-triggered
      * costs zero in the steady state and stamps the offending batch
      * with its own attribution line.
      */
    val SpikeFactor = 3.0

    /** Drive `startQ`'s stream with `Batches` equal slices, timing each
      * processAllAvailable; returns per-batch seconds (matches are
      * accumulated by the caller's sink counter). `label` names the leg
      * in spike lines.
      */
    def drive[A: org.apache.spark.sql.Encoder](all: Array[A], label: String,
        startQ: MemoryStream[A] => org.apache.spark.sql.streaming
          .StreamingQuery): Seq[Double] = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[A]
      val q = startQ(input)
      val done = scala.collection.mutable.ArrayBuffer.empty[Double]
      try {
        slices(all).foreach { b =>
          val t0 = System.nanoTime()
          input.addData(b); q.processAllAvailable()
          val t = (System.nanoTime() - t0) / 1e9
          // batch 1 pays the load/cache materialization by design, so
          // the spike baseline starts once ≥ 2 STEADY batches (i.e. 3
          // completed total) back the running median — a single-sample
          // median would fire spuriously off one fast batch
          if (done.size >= 3) {
            val med = median(done.tail.toSeq)
            if (t > SpikeFactor * med)
              println(f"[ingestprobe] SPIKE $label batch=${done.size + 1} " +
                f"$t%.2f s vs running-median $med%.2f s  [${sent.line()}]")
          }
          done += t
        }
      } finally q.stop()
      done.toSeq
    }

    def report(face: String, scale: String, times: Seq[Double],
        matches: Long): Unit =
      println(f"[ingestprobe] $face%-12s $scale%3s: batch1=${times.head}%.2f s " +
        f"steady=${times.tail.map(t => f"$t%.2f").mkString("/")} s " +
        f"(median ${median(times.tail)}%.2f) matches=$matches" +
        s"  [${sent.line()}]")

    def ckpt(tag: String): String = java.nio.file.Files
      .createTempDirectory(s"graft-ingestprobe-$tag").toString

    /** Post-build artifact anatomy: layout, per-table auto-sized bucket
      * counts (from the recorded `_meta.txt` spec), bytes, and file
      * counts — the SCALE.md wall-table columns next to the walls.
      */
    def describe(face: String, tag: String, idx: String): Unit = {
      val ver = new java.io.File(idx).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("v"))
        .maxBy(_.getName.stripPrefix("v").toLong)
      val metaF = new java.io.File(ver, "_meta.txt")
      val meta = if (!metaF.exists()) Map.empty[String, String]
        else new String(java.nio.file.Files.readAllBytes(metaF.toPath))
          .split("\n").filter(_.contains('=')).map { l =>
            val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
          }.toMap
      val layout = meta.getOrElse("layout", "directory")
      ver.listFiles().filter(_.isDirectory).sortBy(_.getName).foreach { t =>
        val files = t.listFiles().filter(f =>
          f.isFile && f.getName.endsWith(".parquet"))
        val mb = files.map(_.length).sum / 1e6
        val n = meta.get(s"bucket.${t.getName}.n").map(_ + " buckets")
          .getOrElse("-")
        println(f"[ingestprobe] $face%-12s $tag%3s: table=${t.getName}%-10s " +
          f"$layout $n files=${files.length} ${mb}%.1f MB")
      }
    }

    /** Drive the face over one built artifact in FOUR legs: the
      * production default (cache-if-fits — CACHED at these artifact
      * sizes); the cache budget forced to 0 (`…-u`) so the steady state
      * pays the UNCACHED regime — pruned bucket reads where the key set
      * clears the gate, parallel full scans where it doesn't; then the
      * PROBE-THEN-ADMIT loop in both cache regimes (`…-a`, `…-ua`):
      * each batch probes AND is admitted, adding the O(|batch|)
      * bucketed append plus the next batch's version reload — which at
      * cache scale re-materializes the corpus frames per admission
      * (`…-a`), and past the budget is metadata-only (`…-ua`). The
      * admitting legs run LAST (they grow the artifact) and the second
      * rebuilds first. Fresh checkpoint per leg.
      */
    def fourLegs[A: org.apache.spark.sql.Encoder](face: String, tag: String,
        all: Array[A], n: java.util.concurrent.atomic.AtomicLong,
        rebuild: () => Unit)(
        startQ: (MemoryStream[A], String, Boolean, String) =>
          org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      n.set(0)
      report(face, tag,
        drive[A](all, s"$face-$tag",
          in => startQ(in, ckpt(s"$face-$tag"), false, "")),
        n.get())
      n.set(0)
      spark.conf.set("spark.graft.index.cache.maxBytes", "0")
      try report(face, s"$tag-u",
        drive[A](all, s"$face-$tag-u",
          in => startQ(in, ckpt(s"$face-$tag-u"), false, "")),
        n.get())
      finally spark.conf.unset("spark.graft.index.cache.maxBytes")
      // admitting legs: each is a NEW stream (fresh checkpoint, batch
      // ids restart) against the same artifact, so each carries its own
      // admitId — the txnAppId contract the faces document
      n.set(0)
      report(face, s"$tag-a",
        drive[A](all, s"$face-$tag-a",
          in => startQ(in, ckpt(s"$face-$tag-a"), true, s"$face-$tag-a")),
        n.get())
      // uncached + admitting (`…-ua`): per-admission reload is
      // metadata-only here (no corpus-sized cache re-materialization per
      // pointer move), so this leg isolates the admit loop's own cost —
      // the shape a past-cache-budget (100 TB) deployment pays. Fresh
      // REBUILD first: the -a leg admitted this delta already, and
      // re-admitting the same doc_ids under a new admitId would measure
      // probes over duplicated signature rows
      rebuild()
      n.set(0)
      spark.conf.set("spark.graft.index.cache.maxBytes", "0")
      try report(face, s"$tag-ua",
        drive[A](all, s"$face-$tag-ua",
          in => startQ(in, ckpt(s"$face-$tag-ua"), true, s"$face-$tag-ua")),
        n.get())
      finally spark.conf.unset("spark.graft.index.cache.maxBytes")
    }

    def runText(tag: String, corpus: org.apache.spark.sql.DataFrame): Unit = {
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft-ingestprobe-idx-$tag").toString
      val t0 = System.nanoTime()
      graft.analytics.DedupIndex.build(spark, corpus, idx)
      println(f"[ingestprobe] text         $tag%3s: build=${(System.nanoTime() - t0) / 1e9}%.2f s")
      describe("text", tag, idx)
      val n = new java.util.concurrent.atomic.AtomicLong(0)
      fourLegs("text", tag, deltaDocs, n,
        () => graft.analytics.DedupIndex.build(spark, corpus, idx)) { (in, ck, admit, aid) =>
        IngestDedup.dedupIngestFromIndex(in.toDS(), idx, ck,
            admitId = if (admit) Some(aid) else None) {
          (pairs, _) => n.addAndGet(pairs.count()); ()
        }
      }
    }

    def runContain(tag: String, corpus: org.apache.spark.sql.DataFrame): Unit = {
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft-ingestprobe-cidx-$tag").toString
      val t0 = System.nanoTime()
      graft.analytics.ContainIndex.build(spark, corpus, idx)
      println(f"[ingestprobe] containment  $tag%3s: build=${(System.nanoTime() - t0) / 1e9}%.2f s")
      describe("containment", tag, idx)
      val n = new java.util.concurrent.atomic.AtomicLong(0)
      fourLegs("containment", tag, deltaDocs, n,
        () => graft.analytics.ContainIndex.build(spark, corpus, idx)) { (in, ck, admit, aid) =>
        IngestDedup.dedupIngestContainment(in.toDS(), idx, ck,
            admitId = if (admit) Some(aid) else None) {
          (pairs, _) => n.addAndGet(pairs.count()); ()
        }
      }
    }

    def runEmb(tag: String, corpus: org.apache.spark.sql.DataFrame): Unit = {
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft-ingestprobe-sidx-$tag").toString
      val t0 = System.nanoTime()
      graft.analytics.SrpIndex.build(spark, corpus, idx)
      println(f"[ingestprobe] embedding    $tag%3s: build=${(System.nanoTime() - t0) / 1e9}%.2f s")
      describe("embedding", tag, idx)
      val n = new java.util.concurrent.atomic.AtomicLong(0)
      fourLegs("embedding", tag, deltaVecs, n,
        () => graft.analytics.SrpIndex.build(spark, corpus, idx)) { (in, ck, admit, aid) =>
        IngestDedup.dedupIngestEmbeddings(in.toDS(), idx, ck,
            admitId = if (admit) Some(aid) else None) {
          (pairs, _) => n.addAndGet(pairs.count()); ()
        }
      }
    }

    /** The embedding face with REAL duplicate mass (r15 verdict #4): the
      * natural delta matches 1-5 times per run — near-vacuous — so this
      * leg streams [[graft.analytics.DedupQueries.plantedDelta]]'s
      * near-dup copies (exact cos ≈ 0.958, Wide S-curve recall ≈ 0.85)
      * against the FULL corpus of each scale (the copies' sources are
      * the `vec_id % 10 == 0` slice of copy 0, standing at both scales),
      * so per-batch match counts land in the tens and the admission
      * premium is measured on a face that actually matches.
      * `IngestPlantedSpec` pins the recall-vs-model bound on this path.
      */
    def runEmbPlanted(tag: String, corpus: org.apache.spark.sql.DataFrame): Unit = {
      val plantedRows = graft.analytics.DedupQueries.plantedDelta(vecs1)
        .select($"vec_id",
          transform($"embedding", _.cast("float")).as("embedding"))
        .as[IngestVec].collect().sortBy(_.vec_id)
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft-ingestprobe-pidx-$tag").toString
      val t0 = System.nanoTime()
      graft.analytics.SrpIndex.build(spark, corpus, idx)
      println(f"[ingestprobe] emb-planted  $tag%3s: build=${(System.nanoTime() - t0) / 1e9}%.2f s")
      val n = new java.util.concurrent.atomic.AtomicLong(0)
      fourLegs("emb-planted", tag, plantedRows, n,
        () => graft.analytics.SrpIndex.build(spark, corpus, idx)) { (in, ck, admit, aid) =>
        IngestDedup.dedupIngestEmbeddings(in.toDS(), idx, ck,
            admitId = if (admit) Some(aid) else None) {
          (pairs, _) => n.addAndGet(pairs.count()); ()
        }
      }
    }

    runText("1x", docs1.filter($"doc_id" % 5 =!= 4))
    runText("10x", docs10.filter(!isDocDelta))
    runContain("1x", docs1.filter($"doc_id" % 5 =!= 4))
    runContain("10x", docs10.filter(!isDocDelta))
    runEmb("1x", vecs1.filter($"vec_id" % 5 =!= 4))
    runEmb("10x", vecs10.filter(!isVecDelta))
    runEmbPlanted("1x", vecs1)
    runEmbPlanted("10x", vecs10)
    spark.stop()
  }
}
