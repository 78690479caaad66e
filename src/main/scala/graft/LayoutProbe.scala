package graft

import org.apache.spark.sql.functions._

/** Measurement probe for [[graft.analytics.Layout]] (SCALE.md z-order
  * rows): writes `lineitem` twice — z-ordered on (l_partkey, l_suppkey)
  * and hash-scattered ("natural ingest") — then reports how many files a
  * 2-D box predicate touches under each layout, for several box sizes.
  *
  *   sbt "runMain graft.LayoutProbe /root/testdata/sf0.1 64"
  *
  * Files-touched is the file-level stand-in for min/max pruning: rows
  * matching the box concentrate in few z-files (a scan planner reading
  * footer stats skips the rest) and scatter across every natural file.
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-layoutprobe")
    import spark.implicits._
    val li = GraftSession.table(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
    val tmp = java.nio.file.Files.createTempDirectory("graft-layoutprobe")
      .toString
    graft.analytics.Layout.zorderWrite(
      li, "l_partkey", "l_suppkey", nFiles, s"$tmp/z")
    li.withColumn("zval", lit(0L))
      .repartition(nFiles, $"l_orderkey")
      .write.parquet(s"$tmp/nat")
    val bounds = li.agg(max($"l_partkey"), max($"l_suppkey")).first()
    val (maxP, maxS) = (bounds.getLong(0), bounds.getLong(1))
    def touched(path: String, pFrac: Double, sFrac: Double): Long =
      spark.read.parquet(path)
        .filter($"l_partkey" <= (maxP * pFrac).toLong &&
          $"l_suppkey" <= (maxS * sFrac).toLong)
        .select(input_file_name()).distinct().count()
    Seq(0.05, 0.1, 0.25).foreach { frac =>
      val z = touched(s"$tmp/z", frac, frac)
      val nat = touched(s"$tmp/nat", frac, frac)
      println(f"[layoutprobe] box ${frac * 100}%.0f%%x${frac * 100}%.0f%%" +
        s" of domain: z-order touches $z/$nFiles files," +
        s" natural touches $nat/$nFiles")
    }
    spark.stop()
  }
}
