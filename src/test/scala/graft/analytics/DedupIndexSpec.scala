package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted-LSH-index contract: probing the on-disk artifact with a
  * delta must produce EXACTLY the pairs the in-session incremental query
  * finds — the artifact is the same index, just durable.
  */
class DedupIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("probe(artifact, delta) equals the in-session incremental answer") {
    import spark.implicits._
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val corpus = docs.filter($"doc_id" % 5 =!= 4)
    val delta = docs.filter($"doc_id" % 5 === 4)
    val idx = java.nio.file.Files.createTempDirectory("graft-dedup-idx")
      .toString
    DedupIndex.build(spark, corpus, idx)
    val fromDisk = DedupIndex.probe(spark, idx, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inSession = DedupQueries.qDedupIncremental(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inSession.nonEmpty, "sf0.001 must contain delta-corpus pairs")
    assert(fromDisk === inSession)
  }

  test("the artifact IS the corpus side: emptying the band table on disk " +
      "empties the probe result for identical inputs") {
    import spark.implicits._
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files.createTempDirectory("graft-dedup-idx2")
      .toString
    DedupIndex.build(spark, docs.filter($"doc_id" % 5 =!= 4), idx)
    val delta = docs.filter($"doc_id" % 5 === 4)
    assert(DedupIndex.probe(spark, idx, delta).count() > 0)
    // hollow out the band table: same API inputs, zero candidates — so
    // candidates demonstrably come from disk, never from recomputing the
    // corpus
    spark.read.parquet(s"$idx/bands").limit(0)
      .write.mode("overwrite").parquet(s"$idx/bands_empty")
    val p = java.nio.file.Paths.get(idx)
    def rmTree(d: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.delete(f); () })
    }
    rmTree(p.resolve("bands"))
    java.nio.file.Files.move(p.resolve("bands_empty"), p.resolve("bands"))
    assert(DedupIndex.probe(spark, idx, delta).count() === 0,
      "probe found pairs with an empty on-disk band table")
  }
}
