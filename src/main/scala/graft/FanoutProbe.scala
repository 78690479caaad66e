package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement probe for the L0-accrual admission claim (SCALE.md
  * round-18): per-admission FILE COUNT is independent of the corpus's
  * bucket count. The 100× `LoopStress` rehearsals run at the
  * auto-sized 64 buckets, where the pre-L0 fan-out (one file per
  * touched bucket per admission) is muted; a 100 TB corpus implies
  * THOUSANDS of buckets, where a micro-batch's band rows touch ~every
  * bucket and the modulus append wrote ~buckets files per admission.
  * This probe builds the text and embedding faces at a caller-chosen
  * bucket count (default 1024), admits micro-batches at the streaming
  * contract's size (default 125 docs), and reports per admission: the
  * wall, the NEW (non-hard-link) file count by table, the L0 file
  * count, and the bucket count the delta's band rows TOUCH — i.e. the
  * file count the pre-L0 modulus append would have written.
  *
  *   sbt "runMain graft.FanoutProbe /root/testdata/sf0.1 1024 4 125"
  */
object FanoutProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val buckets = args.lift(1).map(_.toInt).getOrElse(1024)
    val batches = args.lift(2).map(_.toInt).getOrElse(4)
    val batchSize = args.lift(3).map(_.toInt).getOrElse(125)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, "graft-fanout")
    graft.functions.VectorFunctions.register(spark)
    val sentinels = new HostSentinels.Warmed

    runFace(spark, "text", dir, buckets, batches, batchSize, sentinels)
    runFace(spark, "embed", dir, buckets, batches, batchSize, sentinels)
    println(s"[fanout] blackhole=${HostSentinels.blackhole}")
    spark.stop()
  }

  /** Per-version part files, keyed by table/slot-relative path. */
  private def parts(ver: java.io.File): Map[String, java.io.File] = {
    def walk(d: java.io.File, prefix: String): Seq[(String, java.io.File)] =
      Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
        if (f.isDirectory) walk(f, s"$prefix${f.getName}/")
        else if (f.getName.endsWith(".parquet"))
          Seq(s"$prefix${f.getName}" -> f)
        else Nil
      }
    walk(ver, "").toMap
  }

  private def runFace(spark: SparkSession, face: String, dir: String,
      buckets: Int, batches: Int, batchSize: Int,
      sentinels: HostSentinels.Warmed): Unit = {
    import spark.implicits._
    val (idCol, rows) = face match {
      case "text" => ("doc_id", GraftSession.table(spark, dir, "documents")
        .select($"doc_id", $"text"))
      case _ => ("vec_id", GraftSession.table(spark, dir, "embeddings")
        .select($"vec_id", $"embedding"))
    }
    val corpus = rows.filter(col(idCol) % 5 < 3)
    val pool = rows.filter(col(idCol) % 5 === 3)
      .orderBy(col(idCol)).limit(batches * batchSize)
    val poolIds = pool.select(col(idCol)).collect().map(_.getLong(0))
    val idx = java.nio.file.Files
      .createTempDirectory(s"graft-fanout-$face").toString

    val t0 = System.nanoTime()
    face match {
      case "text" => graft.analytics.DedupIndex.build(spark, corpus, idx,
        bucketed = true, buckets = buckets)
      case _ => graft.analytics.SrpIndex.build(spark, corpus, idx,
        bucketed = true, buckets = buckets)
    }
    println(f"[fanout] $face build at $buckets buckets: " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s [${sentinels.line()}]")

    // the file count the PRE-L0 modulus append would write per table:
    // distinct bucket ids the delta's rows hash to (same pmod(murmur3)
    // the bucketed writer uses)
    def touched(delta: DataFrame, keyCols: Seq[String]): Long =
      delta.select(pmod(hash(keyCols.map(col): _*), lit(buckets)).as("b"))
        .distinct().count()

    (0 until batches).foreach { k =>
      val ids = poolIds.slice(k * batchSize, (k + 1) * batchSize)
      val delta = pool.filter(col(idCol).isin(ids: _*))
      val verBefore = currentVer(idx)
      val before = parts(verBefore)
      val tb = System.nanoTime()
      face match {
        case "text" => graft.analytics.DedupIndex.append(spark, delta,
          idx, s"fanout-$k")
        case _ => graft.analytics.SrpIndex.append(spark, delta, idx,
          s"fanout-$k")
      }
      val wall = (System.nanoTime() - tb) / 1e9
      val after = parts(currentVer(idx))
      // new = not a hard link of a same-pathed file in the prior version
      val fresh = after.filterNot { case (rel, f) =>
        before.get(rel).exists(old =>
          java.nio.file.Files.isSameFile(f.toPath, old.toPath))
      }
      val l0 = fresh.keys.count(_.contains("_l0/"))
      val byTable = fresh.keys.toSeq.groupBy(_.split('/').head)
        .map { case (t, fs) => s"$t=${fs.size}" }.toSeq.sorted
        .mkString(" ")
      // band rows at the artifact's recorded shape
      val wouldTouch = face match {
        case "text" => touched(graft.analytics.DedupIndex
          .deltaBandFrame(spark, idx, delta), Seq("bk"))
        case _ => touched(graft.analytics.SrpIndex
          .deltaBandFrame(spark, idx, delta), Seq("bk"))
      }
      println(f"[fanout] $face admit $k: wall=$wall%.2f s " +
        f"newFiles=${fresh.size} ($byTable l0=$l0) " +
        f"preL0BandFiles=$wouldTouch [${sentinels.line()}]")
    }
  }

  private def currentVer(idx: String): java.io.File =
    new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .maxBy(_.getName.stripPrefix("v").toLong)
}
