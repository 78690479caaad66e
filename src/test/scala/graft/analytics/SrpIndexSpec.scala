package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted SRP-index contract — same shape as `DedupIndexSpec`:
  * probing the durable artifact equals the in-session incremental face,
  * admitted deltas become corpus, and an at-least-once re-probe of an
  * admitted delta reports no self-pairs.
  */
class SrpIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def vecs = {
    import spark.implicits._
    graft.GraftSession.table(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
  }

  test("probe(artifact, delta) equals the in-session incremental answer") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-srp-idx")
      .toString
    SrpIndex.build(spark, vecs.filter($"vec_id" % 5 =!= 4), idx)
    val fromDisk = SrpIndex
      .probe(spark, idx, vecs.filter($"vec_id" % 5 === 4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inSession = DedupQueries.embeddingIncrementalInSession(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inSession.nonEmpty, "sf0.001 must contain cross-split pairs")
    assert(fromDisk === inSession)
  }

  test("probe-then-admit: an admitted delta becomes corpus; re-probe has " +
      "no self-pairs") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-srp-idx2")
      .toString
    SrpIndex.build(spark, vecs.filter($"vec_id" % 5 < 3), idx)
    val day1 = vecs.filter($"vec_id" % 5 === 3)
    val day2 = vecs.filter($"vec_id" % 5 === 4)
    val before = SrpIndex.probe(spark, idx, day2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(SrpIndex.append(spark, day1, idx, "day1"))
    val after = SrpIndex.probe(spark, idx, day2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.subsetOf(after), "admit lost previously-findable pairs")
    // idempotent retry
    assert(!SrpIndex.append(spark, day1, idx, "day1"))
    assert(SrpIndex.appliedDeltas(idx) === Set("day1"))
    // re-probe the admitted day1: its own copies must not self-match
    val again = SrpIndex.probe(spark, idx, day1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.forall(p => p._1 != p._2),
      "re-probe emitted self-pairs for already-admitted vectors")
  }

  test("compact: file count drops, probe multiset and deltas unchanged") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-srp-idx3")
      .toString
    SrpIndex.build(spark, vecs.filter($"vec_id" % 5 < 3), idx)
    assert(SrpIndex.append(spark, vecs.filter($"vec_id" % 5 === 3), idx,
      "day1"))
    val delta = vecs.filter($"vec_id" % 5 === 4)
    val before = SrpIndex.probe(spark, idx, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    def files(t: String): Int =
      new java.io.File(SrpIndex.tablePath(idx, t)).listFiles()
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val fat = files("bands")
    assert(SrpIndex.compact(spark, idx, maxFiles = 1) > 0)
    assert(files("bands") < fat)
    val after = SrpIndex.probe(spark, idx, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    assert(after === before, "compaction changed the probe multiset")
    assert(SrpIndex.appliedDeltas(idx) === Set("day1"))
  }
}
