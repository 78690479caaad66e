package graft

import org.apache.spark.sql.functions._

/** Measurement probe (round 22): does DYNAMIC PARTITION PRUNING fire on
  * the CdcServingTable merge's candidate base-read shape — a
  * (tbl, pkb)-partitioned parquet read LEFT-SEMI joined on its partition
  * columns against a tiny batch-derived key frame? The merge's
  * steady-state single-job rewrite (replacing the collected touched-set
  * isin filter) is only scale-safe if the semi join prunes untouched
  * partition DIRECTORIES at runtime the way the collected filter prunes
  * them at plan time. Prints the scan's PartitionFilters and the
  * files-read counter so the claim is checkable by eye.
  */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "graft-dpp-probe")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString

    // a (tbl, pkb)-partitioned store: 3 tables x 4 buckets x 100 rows
    val store = (0 until 1200).map { i =>
      (s"t${i % 3}", (i / 3) % 4, s"pk$i", s"v$i")
    }.toDF("tbl", "pkb", "pk", "payload")
    store.repartition($"tbl", $"pkb")
      .write.mode("overwrite").partitionBy("tbl", "pkb").parquet(dir)

    // batch touches ONE table, ONE bucket
    val touched = Seq(("t1", 2)).toDF("tbl", "pkb")

    val base = spark.read.parquet(dir)
      .join(touched, Seq("tbl", "pkb"), "left_semi")
    base.collect()
    val plan = base.queryExecution.executedPlan.toString
    val dpp = plan.contains("dynamicpruning")
    System.err.println(s"[dpp-probe] dynamicpruning in plan: $dpp")
    val scanLine = plan.linesIterator
      .filter(l => l.contains("PartitionFilters")).mkString("\n")
    System.err.println(s"[dpp-probe] $scanLine")
    // files actually read: the scan metric the pruning must move
    val scan = base.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles").map(_.value))
    System.err.println(s"[dpp-probe] numFiles read: ${scan.mkString(",")} " +
      s"(store has 12 partition dirs; pruned run must read ~1)")
    spark.stop()
  }
}
