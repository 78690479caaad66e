package graft

import org.apache.spark.sql.functions._

/** Measurement probe for [[graft.analytics.DedupQueries.qDedupContainment]]'s
  * prefix filter (SCALE.md containment rows): vocabulary size, prefix df
  * mass (Σ df over emitted prefix tokens — the candidate-volume bound),
  * and the realized candidate-pair count, for a given corpus dir.
  *
  *   sbt "runMain graft.ContainProbe /root/testdata/sf0.1"
  *
  * This probe is how the 5-char degenerate case was caught: on this
  * corpus 5-char shingles have a ~2 k vocabulary over 5 k docs, the
  * "rarest" token still has df ≈ 250, and candidates approach all-pairs
  * (11.9 M, 77 s verify). The shipped 16-char unit measures ~600 k
  * vocabulary (corpus-wide mean df ≈ 2.3 = 1.41 M postings / 603 k
  * terms; PREFIX df_avg 1.10 — the rarest slice) and 569 candidate
  * pairs — ~21 000× fewer. Full numbers in SCALE.md's containment rows.
  */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-containprobe")
    import spark.implicits._
    val sh = GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
      .repartition($"doc_id")
      .select($"doc_id",
        explode(expr(graft.analytics.DedupQueries.containShingleExpr)).as("sh"))
      .distinct()
      .select($"doc_id", xxhash64($"sh").as("hx"))
      .persist()
    println(s"[containprobe] doc-shingle rows: ${sh.count()}")
    val dfT = sh.groupBy($"hx").agg(count(lit(1)).as("df"))
    println(s"[containprobe] vocab: ${dfT.count()}")
    val ranked = graft.analytics.DedupQueries.containRanked(sh, dfT).persist()
    val prefixA = graft.analytics.DedupQueries.containPrefix(ranked)
      .select($"doc_id".as("id_a"), $"hx")
    val mass = prefixA.join(dfT, "hx")
      .agg(count(lit(1)).as("prefix_rows"), sum($"df").as("df_mass"),
        max($"df").as("df_max"), avg($"df").as("df_avg")).first()
    println(s"[containprobe] prefix rows: ${mass.getLong(0)}" +
      s" df_mass: ${mass.getLong(1)} df_max: ${mass.getLong(2)}" +
      f" df_avg: ${mass.getDouble(3)}%.2f")
    val cand = prefixA
      .join(ranked.select($"doc_id".as("id_b"), $"hx"), "hx")
      .filter($"id_a" =!= $"id_b")
      .select($"id_a", $"id_b").distinct()
    println(s"[containprobe] candidate pairs: ${cand.count()}")
    spark.stop()
  }
}
