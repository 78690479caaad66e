package graft.analytics

import graft.SparkSpec

/** Band-count invariance of the 60-bit simhash engine
  * ([[DedupQueries.simhash60Pairs]]): the pigeonhole argument (≤ 3
  * differing bits cannot touch all bands when bands ≥ 4) plus the
  * full-sketch hamming verify make the OUTPUT identical for every legal
  * band count — the band knob tunes bucket cardinality for scale
  * (SCALE.md band-shape law), never the answer. This is the
  * configuration-surface counterpart of the minhash invariance test in
  * `DedupIncrementalSpec` and the SRP monotonicity test in `SrpShapeSpec`.
  */
class SimhashBandsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every legal band count recovers exactly the oracled 4-band pair set") {
    def pairs(bands: Int): Set[(Long, Long)] =
      DedupQueries.simhash60Pairs(spark, sf, bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oracled = pairs(4) // the q_dedup_simhash64 shape
    assert(oracled.nonEmpty, "fixture corpus must contain near-dups")
    Seq(5, 6, 10).foreach { b =>
      assert(pairs(b) === oracled,
        s"$b-band shape diverged from the oracled 4-band output")
    }
  }

  test("illegal shapes are rejected: too few bands for the hamming radius, " +
      "or a width that does not divide the sketch") {
    intercept[IllegalArgumentException] {
      DedupQueries.simhash60Pairs(spark, sf, bands = 3)
    }
    intercept[IllegalArgumentException] {
      DedupQueries.simhash60Pairs(spark, sf, bands = 7)
    }
  }
}
