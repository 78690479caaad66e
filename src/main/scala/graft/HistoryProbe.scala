package graft

import org.apache.spark.sql.functions._

/** Measures [[graft.streaming.CdcHistoryTable]]'s small-file accrual and
  * compaction economics (r13 verdict #6) —
  *
  *   sbt "runMain graft.HistoryProbe <sfDir> <copies> <batches>"
  *
  * Seeds an append-only changelog with `batches` micro-batch appends of
  * the events table grown `copies`× by TABLE COUNT (each copy its own
  * `click_k`-style table set — the StoreProbe scaling convention), so
  * file accrual grows as batches × touched tables: the day-of-5-second-
  * batches shape in miniature. Times the `history()` SCD2 read against
  * the accrued files, compacts (default fat-partition threshold,
  * maxFiles = 4), re-times the identical read, and prints file counts
  * before/after plus how many partitions the compactor rewrote vs
  * hard-link-carried — the evidence that (1) per-batch appends cost
  * O(batch) writes, (2) the read tax grows with FILE COUNT not bytes,
  * (3) compaction pays it down partition-pruned (only fat `tbl=` dirs
  * rewrite; everything else carries as links).
  */
object HistoryProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: graft.HistoryProbe <sfDir> <copies> <batches>")
    val Array(sfDir, copiesS, batchesS) = args.take(3)
    val copies = copiesS.toInt
    val batches = batchesS.toInt
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-historyprobe")
    import spark.implicits._
    val ev = GraftSession.table(spark, sfDir, "events")
    val types = ev.select($"event_type").distinct()
      .collect().map(_.getString(0)).sorted
    val img = map(lit("event_id"), col("event_id").cast("string"),
      lit("user_id"), col("user_id").cast("string"))
    def envelopes(df: org.apache.spark.sql.DataFrame) = df.select(
      lit("app").as("database"), col("event_type").as("table"),
      lit("insert").as("action"),
      typedlit(Map.empty[String, String]).as("before"), img.as("after"),
      typedlit(Seq.empty[Seq[String]]).as("orgRow"),
      struct(unix_timestamp(col("ts")).as("timestamp"),
        col("event_id").as("logPos"), lit("").as("segment"))
        .as("eventHeader")).as[graft.model.MQEvent]
    val grown = (0 until copies).map(k =>
      ev.withColumn("event_type", concat($"event_type", lit(s"_$k")))
        .withColumn("event_id", $"event_id" + k * 1000000000L))
      .reduce(_ unionByName _)
      // slice column BEFORE envelope projection: batches split the same
      // grown frame deterministically
      .withColumn("slice", pmod($"event_id", lit(batches)))
      .persist()
    val dir = java.nio.file.Files.createTempDirectory("history-probe")
      .toString
    val hist = new graft.streaming.CdcHistoryTable(dir,
      (for { t <- types.toSeq; k <- 0 until copies }
        yield s"app.${t}_$k" -> "event_id").toMap)
    val t0 = System.nanoTime()
    (0 until batches).foreach(b =>
      hist.append(envelopes(grown.filter($"slice" === b))))
    val appendSec = (System.nanoTime() - t0) / 1e9
    grown.unpersist()
    // count the CURRENT version only (compaction leaves the previous
    // version for prune; counting it would double the "after" number)
    def files(): Int = {
      def walk(f: java.io.File): Int =
        if (f.isFile) { if (f.getName.endsWith(".parquet")) 1 else 0 }
        else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      val log = new java.io.File(dir, "log")
      Option(log.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("v"))
        .sortBy(_.getName.stripPrefix("v").toLong)
        .lastOption.map(walk).getOrElse(0)
    }
    val filesBefore = files()
    val t1 = System.nanoTime()
    val rowsBefore = hist.history(spark).count()
    val readFatSec = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val rewritten = hist.compact(spark)
    val compactSec = (System.nanoTime() - t2) / 1e9
    val filesAfter = files()
    val t3 = System.nanoTime()
    val rowsAfter = hist.history(spark).count()
    val readCompactSec = (System.nanoTime() - t3) / 1e9
    require(rowsAfter == rowsBefore,
      s"compaction changed the history multiset: $rowsBefore -> $rowsAfter")
    println(f"""{"copies":$copies,"batches":$batches,"tables":${types.length * copies},"rows":$rowsBefore,"append_sec":$appendSec%.3f,"files_before":$filesBefore,"read_fat_sec":$readFatSec%.3f,"partitions_rewritten":$rewritten,"compact_sec":$compactSec%.3f,"files_after":$filesAfter,"read_compact_sec":$readCompactSec%.3f}""")
    spark.stop()
  }
}
