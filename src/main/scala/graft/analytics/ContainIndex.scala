package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED containment index — the artifact
  * [[DedupQueries.qDedupContainmentIncremental]]'s scaladoc names ("the
  * part a production deployment persists"): built once at corpus ingest,
  * probed by every delta with O(|delta| × df) compute.
  *
  * Four parquet tables under `indexDir` (16-char shingle unit, fragment
  * floor n ≥ 20 applied at build):
  *   - `tokens` (hx, doc_id) — the full inverted index (new-in-old
  *     probes land here);
  *   - `prefix` (hx, doc_id) — each doc's ⌊n/10⌋+1 rarest tokens (~10 %
  *     of `tokens`; old-in-new probes land here — the reason this
  *     direction never scans corpus-sized state);
  *   - `sets`   (doc_id, hs, sz) — sorted hash sets for the exact
  *     merge-scan verify;
  *   - `df`     (hx, df) — corpus document frequencies, used to rank the
  *     DELTA's prefix tokens rarest-first at probe time.
  * Probe-time df is corpus-df (frozen at build; unseen delta tokens rank
  * rarest at df 0): the prefix pigeonhole is ORDER-INDEPENDENT (any
  * ⌊n/10⌋+1 distinct shingles of the contained doc witness containment),
  * so frozen df costs efficiency at worst, never recall —
  * `ContainIndexSpec` pins probe output equal to the in-session
  * incremental face, which ranks by live df.
  */
object ContainIndex {

  private def shingled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(expr(DedupQueries.containShingleExpr)).as("sh"))
      .distinct()
      .select(col("doc_id"), xxhash64(col("sh")).as("hx"))

  /** Build the index from a `(doc_id, text)` corpus frame. */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String): Unit = {
    val sh = shingled(docs).persist()
    try {
      val dfTable = sh.groupBy(col("hx")).agg(count(lit(1)).as("df"))
      dfTable.write.mode("overwrite").parquet(s"$indexDir/df")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("hx"))
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
      val ranked = sh.join(dfTable, "hx")
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("n") >= 20)
      ranked.select(col("hx"), col("doc_id"))
        .write.mode("overwrite").parquet(s"$indexDir/tokens")
      ranked.filter(col("rn") <= floor(col("n") / 10) + 1)
        .select(col("hx"), col("doc_id"))
        .write.mode("overwrite").parquet(s"$indexDir/prefix")
      sh.groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("hx"))).as("hs"))
        .withColumn("sz", size(col("hs")).cast("long"))
        .filter(col("sz") >= 20)
        .write.mode("overwrite").parquet(s"$indexDir/sets")
    } finally { sh.unpersist(); () }
  }

  /** ADMIT a delta into the standing index (the probe-then-admit
    * lifecycle, see [[DedupIndex.append]]): appends the delta's token
    * postings, prefix postings, and verify sets. The delta's prefixes
    * are ranked by the FROZEN corpus df (unseen tokens rarest) and the
    * df table is NOT rewritten — safe by the pigeonhole's
    * order-independence (stale df can cost posting-list efficiency,
    * never recall), which is precisely what keeps admission O(|delta|):
    * a df rewrite would be a corpus-sized job on every ingest.
    * Re-freshen df with a periodic [[build]] when probe cost drifts.
    */
  def append(spark: SparkSession, docs: DataFrame, indexDir: String): Unit = {
    val sh = shingled(docs).persist()
    try {
      val corpusDf = spark.read.parquet(s"$indexDir/df")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("hx"))
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
      val ranked = sh.join(corpusDf, Seq("hx"), "left")
        .withColumn("df", coalesce(col("df"), lit(0L)))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("n") >= 20)
      ranked.select(col("hx"), col("doc_id"))
        .write.mode("append").parquet(s"$indexDir/tokens")
      ranked.filter(col("rn") <= floor(col("n") / 10) + 1)
        .select(col("hx"), col("doc_id"))
        .write.mode("append").parquet(s"$indexDir/prefix")
      sh.groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("hx"))).as("hs"))
        .withColumn("sz", size(col("hs")).cast("long"))
        .filter(col("sz") >= 20)
        .write.mode("append").parquet(s"$indexDir/sets")
    } finally { sh.unpersist(); () }
  }

  /** Probe with a `(doc_id, text)` delta frame: ordered containment
    * pairs (id_a contained-in id_b, ≥ 0.9) with exactly one side in the
    * delta — both directions found by delta-sized probes of the standing
    * tables (delta prefixes × `tokens`, delta tokens × `prefix`).
    */
  def probe(spark: SparkSession, indexDir: String,
      deltaDocs: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    // no persist — see DedupIndex.probe: a lazy return plus an
    // un-released cache entry per daily probe is a session-length leak
    val sh = shingled(deltaDocs)
    val corpusDf = spark.read.parquet(s"$indexDir/df")
    // delta prefix ranks by FROZEN corpus df; unseen tokens are rarest
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("hx"))
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
    val ranked = sh.join(corpusDf, Seq("hx"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .filter(col("n") >= 20)
    val deltaPrefix = ranked.filter(col("rn") <= floor(col("n") / 10) + 1)
      .select(col("hx"), col("doc_id"))
    val deltaTokens = ranked.select(col("hx"), col("doc_id"))
    val corpusTokens = spark.read.parquet(s"$indexDir/tokens")
    val corpusPrefix = spark.read.parquet(s"$indexDir/prefix")
    val newInOld = deltaPrefix.withColumnRenamed("doc_id", "id_a")
      .join(corpusTokens.withColumnRenamed("doc_id", "id_b"), "hx")
    val oldInNew = corpusPrefix.withColumnRenamed("doc_id", "id_a")
      .join(deltaTokens.withColumnRenamed("doc_id", "id_b"), "hx")
    val cand = newInOld.unionByName(oldInNew)
      .select(col("id_a"), col("id_b")).distinct()
    val deltaSets = sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("hx"))).as("hs"))
      .withColumn("sz", size(col("hs")).cast("long"))
      .filter(col("sz") >= 20)
    val per = spark.read.parquet(s"$indexDir/sets").unionByName(deltaSets)
    DedupQueries.verifyContainment(per, cand)
  }
}
