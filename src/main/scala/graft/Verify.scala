package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession.builder so the verified plans carry the SAME session
    // config (AQE, agg fallback threshold, UTC, nanos) as the benched and
    // spec-pinned ones — a hand-rolled builder here silently drifts.
    val spark = GraftSession.builder("graft-verify")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration filter (same contract as Bench); driver leaves it
    // unset → full dump
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def selected(name: String) = only.forall(_.contains(name))
    // A throwing query must be a LOUD red row, not a silently-missing key:
    // record every failure in _errors.json next to the dumps (r9's broken
    // query was invisible in the correctness JSON because the row was
    // simply absent).
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.filter(e => selected(e._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: $msg")
        errors(name) = s"${e.getClass.getSimpleName}: ${msg.take(500)}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(e => selected(e._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Band-recall precondition (ADVICE r13): q_dedup_incremental256's
    // oracle pins the 32x8/256 LSH probe against the EXACT delta-corpus
    // answer, which holds only while the fixture has no true pairs where
    // the r=8 S-curve's miss probability is non-negligible. Assert the
    // precondition with the recall-complete 16x4/128 face (miss ~4e-8 at
    // the threshold): a fixture/generator drift then fails as THIS
    // diagnosable error row, not as an opaque hash mismatch on a correct
    // engine. Band top CALIBRATED (r21): miss(j) = (1 - j^8)^32, so the
    // per-pair miss crosses 1e-6 at j ≈ 0.877 — the guard flags pairs in
    // [0.8, 0.88), where miss ranges 2.8e-3 .. 6.3e-7 and the exact
    // oracle genuinely stops bounding the probe. The previous rough 0.93
    // top cried wolf at sf0.1 on a j = 0.923 pair whose miss is 3.9e-11
    // (r20 verdict #5); pairs in [0.88, 0.93) are ~1e-7..1e-11 misses —
    // hundreds of them would still leave the fixture's total miss
    // probability under 1e-4.
    if (selected("q_dedup_incremental256") &&
        !errors.contains("q_dedup_incremental256"))
      try {
        val inBand = SparkEntry.queries("q_dedup_incremental")(spark, sfDir)
          .filter("jaccard >= 0.8 AND jaccard < 0.88").count()
        if (inBand > 0)
          errors("q_dedup_incremental256") =
            s"band-recall precondition violated: $inBand true pairs in " +
              "j in [0.8, 0.88) — the fixture drifted into the 32x8/256 " +
              "shape's miss band (per-pair miss > 1e-6), so its exact " +
              "oracle no longer bounds the probe; re-seed the fixture " +
              "or re-derive the oracle"
      } catch { case e: Throwable =>
        errors("q_dedup_incremental256") =
          "band-recall precondition check failed: " +
            Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
    // Always written (usually `{}`) so its ABSENCE is also a signal; exit
    // stays 0 — one broken query must not void the other dumps.
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    spark.stop()
  }
}
