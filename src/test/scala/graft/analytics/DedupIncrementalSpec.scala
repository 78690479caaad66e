package graft.analytics

import graft.SparkSpec

/** Structural invariants of the incremental (delta-probes-corpus) dedup
  * beyond the driver's value-level oracle: every emitted pair crosses the
  * corpus/delta split in the right orientation, passes the verify
  * threshold, and appears at most once.
  */
class DedupIncrementalSpec extends SparkSpec {

  test("incremental pairs cross the split, pass the threshold, and are unique") {
    val rows = DedupQueries
      .qDedupIncremental(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("corpus_id"), r.getAs[Long]("new_id"),
        r.getAs[Double]("jaccard")))
    assert(rows.nonEmpty, "fixture corpus must contain cross-split near-dups")
    rows.foreach { case (corpusId, newId, j) =>
      assert(corpusId % 5 != 4, s"corpus_id $corpusId is from the delta")
      assert(newId % 5 == 4, s"new_id $newId is not from the delta")
      assert(j >= 0.8, s"pair ($corpusId, $newId) below threshold: $j")
    }
    assert(rows.map(p => (p._1, p._2)).distinct.length === rows.length,
      "candidate distinct() must dedupe multi-band collisions")
  }

  test("nearDupStats: steeper band shapes (128- and 256-slot) recover the " +
      "same verified pair set as the oracled 32x4 shape") {
    // the SCALE.md band-shape law's correctness half: raising rowsPerBand
    // prunes candidates (that's the measured scaling claim) but must not
    // change the exact-verified OUTPUT on a corpus whose dup mass sits
    // above the S-curve knee — pinned here on driver data for the shared
    // 128-slot chain shape and the graft_minhash256 wide shape
    val dir = "/root/testdata/sf0.001"
    val (docs, candR4, verifiedR4) =
      DedupQueries.nearDupStats(spark, dir, bands = 32, rowsPerBand = 4, 0.7)
    val (_, candR8, verifiedR8) =
      DedupQueries.nearDupStats(spark, dir, bands = 16, rowsPerBand = 8, 0.7)
    val (_, candWide, verifiedWide) =
      DedupQueries.nearDupStats(spark, dir, bands = 32, rowsPerBand = 8, 0.7)
    assert(docs > 0 && verifiedR4 > 0, "fixture corpus must contain near-dups")
    assert(verifiedR8 === verifiedR4, "16x8 must verify the same pairs")
    assert(verifiedWide === verifiedR4, "32x8/256-slot must verify the same pairs")
    assert(candR8 <= candR4, "r=8 must not expand the candidate set")
    assert(candWide <= candR4, "the wide shape must not expand the candidate set")
  }
}
