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
}
