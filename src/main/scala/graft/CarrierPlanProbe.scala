package graft

/** Plan audit of the MANIFEST-carrier probe vs its link twin: prints
  * both physical plans so carrier parity is inspectable. Since the r21
  * mount (`IndexLayout.mountManifest` — the logical file list
  * materialized as a per-version symlink tree and registered with the
  * same bucketed spec) BOTH carriers' corpus sides are bucketed catalog
  * scans (bucket `HashPartitioning` reported, `SelectedBucketsCount`
  * pruning available): the plans should be topology-identical, which
  * `ManifestMountSpec` pins and this probe lets you eyeball.
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
