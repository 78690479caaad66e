package graft.analytics

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Band-shape instrumentation for the DURABLE index artifacts — the
  * measurement behind SCALE.md's shape-parameterization rows:
  *
  *   sbt "runMain graft.analytics.ShapeProbe <sfDir>"
  *
  * For each family × shape, builds the artifact on the 4/5 corpus split,
  * computes the delta-probe CANDIDATE volume from band-bucket occupancy
  * cross-counts (Σ over (band, key) of corpus_n × delta_n — the verify
  * stage's workload, counted without materializing the join), and times
  * the full probe. Run at two SFs; the candidate-volume growth ratio is
  * the quadratic-cliff detector: a shape whose candidates grow ≫ corpus
  * growth is banding on cardinality-capped keys.
  */
object ShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-shapeprobe")
    import spark.implicits._

    def crossCount(corpus: org.apache.spark.sql.DataFrame,
        delta: org.apache.spark.sql.DataFrame,
        keys: Seq[String]): Long = {
      val kc = keys.map(col)
      corpus.groupBy(kc: _*).agg(count(lit(1)).as("cn"))
        .join(delta.groupBy(kc: _*).agg(count(lit(1)).as("dn")), keys)
        .agg(coalesce(sum($"cn" * $"dn"), lit(0L)).cast("long"))
        .first().getLong(0)
    }

    // SRP family: Narrow (legacy/oracle) vs Wide (corpus-scale default)
    val vecs = GraftSession.table(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
    val vCorpus = vecs.filter($"vec_id" % 5 =!= 4)
    val vDelta = vecs.filter($"vec_id" % 5 === 4)
    Seq("narrow" -> DedupQueries.Srp.Narrow,
        "wide" -> DedupQueries.Srp.Wide).foreach { case (label, shape) =>
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft-shapeprobe-srp-$label").toString
      SrpIndex.build(spark, vCorpus, idx, shape)
      val corpusBands = spark.read.parquet(SrpIndex.tablePath(idx, "bands"))
      val deltaBands = DedupQueries.srpBandsOf(spark,
        DedupQueries.srpVectorsOf(spark, vDelta), shape)
      val cand = crossCount(corpusBands, deltaBands, Seq("band", "bits"))
      val t0 = System.nanoTime()
      val verified = SrpIndex.probe(spark, idx, vDelta).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"srp","shape":"$label","bands":${shape.bands},"rowsPerBand":${shape.rowsPerBand},"cand_pairs":$cand,"verified":$verified,"probe_sec":$sec%.2f,"dir":"$dir"}""")
    }

    // MinHash family: Oracle 16x4/128 vs Corpus 32x8/256
    val docs = GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val dCorpus = docs.filter($"doc_id" % 5 =!= 4)
    val dDelta = docs.filter($"doc_id" % 5 === 4)
    Seq("oracle" -> DedupIndex.Shape.Oracle,
        "corpus" -> DedupIndex.Shape.Corpus).foreach { case (label, shape) =>
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft-shapeprobe-mh-$label").toString
      DedupIndex.build(spark, dCorpus, idx, shape)
      val corpusBands = spark.read.parquet(DedupIndex.tablePath(idx, "bands"))
      val bandCols = DedupQueries.bandStructs(shape.bands, shape.rowsPerBand,
        shape.slots)
      val deltaBands = DedupQueries.signaturesOf(dDelta, shape.slots)
        .select($"doc_id", explode(array(bandCols: _*)).as("bs"))
        .select($"doc_id", $"bs.band".as("band"), $"bs.sig".as("sig"))
      val cand = crossCount(corpusBands, deltaBands, Seq("band", "sig"))
      val t0 = System.nanoTime()
      val verified = DedupIndex.probe(spark, idx, dDelta).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"minhash","shape":"$label","bands":${shape.bands},"rowsPerBand":${shape.rowsPerBand},"slots":${shape.slots},"cand_pairs":$cand,"verified":$verified,"probe_sec":$sec%.2f,"dir":"$dir"}""")
    }
    spark.stop()
  }
}
