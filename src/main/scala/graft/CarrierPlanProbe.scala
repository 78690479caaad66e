package graft

/** Plan audit of the MANIFEST-carrier probe vs its link twin: prints
  * both physical plans so the carrier trade is inspectable — the link
  * twin's corpus side is a bucketed catalog scan (bucket
  * `HashPartitioning` reported, `SelectedBucketsCount` pruning
  * available), the manifest side is a plain file-list scan that
  * shuffles into the bk equi-join (the LOCATION-based registration
  * needs a physical dir; at a real object-store deployment a table
  * format supplies the bucket metadata — see `DedupIndex.CarrierConf`).
  *
  *   tools/run_main.sh graft.CarrierPlanProbe [sfDir]
  */
object CarrierPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("graft-carrier-plan")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("===== manifest carrier (q_dedup_admitted_manifest) =====")
    graft.analytics.DedupQueries.queries("q_dedup_admitted_manifest")(
      spark, dir).explain("formatted")
    println("===== link carrier (q_dedup_admitted) =====")
    graft.analytics.DedupQueries.queries("q_dedup_admitted")(spark, dir)
      .explain("formatted")
    spark.stop()
  }
}
