package graft.analytics

import graft.SparkSpec

/** UniMax allocation invariants on the real corpus — the properties the
  * published algorithm guarantees, independent of the DuckDB hash-check:
  * budget conservation, cap respect, and the ascending-prefix structure
  * of the capped set that the closed form relies on.
  */
class SamplingQueriesSpec extends SparkSpec {

  test("unimax: budget conserved, caps respected, capped set is a prefix") {
    val rows = SamplingQueries.qSampleUnimax(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("chars"),
        r.getAs[Long]("cap"), r.getAs[Boolean]("capped"),
        r.getAs[Double]("alloc"), r.getAs[Double]("epochs")))
    assert(rows.length === 5)
    val budget = rows.map(_._2).sum.toDouble
    val allocated = rows.map(_._5).sum
    assert(math.abs(allocated - budget) / budget < 1e-12,
      s"water-filling must spend the whole budget: $allocated vs $budget")
    rows.foreach { case (lang, chars, cap, _, alloc, epochs) =>
      assert(alloc <= cap + 1e-9, s"$lang allocated over its cap")
      assert(math.abs(epochs - alloc / chars) < 1e-12)
      assert(epochs <= 1.2 + 1e-12, s"$lang exceeds the 1.2-epoch cap")
    }
    // ascending by cap, the capped languages form a prefix (the property
    // that makes the closed-form SQL equal the sequential greedy)
    val byCap = rows.sortBy(r => (r._3, r._1)).map(_._4)
    assert(byCap === byCap.sorted.reverse, // true…true,false…false
      s"capped set is not an ascending-capacity prefix: ${byCap.toSeq}")
    // uncapped languages all sit at the common water level
    val levels = rows.filter(!_._4).map(_._5).distinct
    assert(levels.length <= 1, s"uncapped allocations differ: ${levels.toSeq}")
  }

  test("temperature mixture: shares normalize, flattening moves toward uniform") {
    val rows = SamplingQueries
      .qSampleTemperature(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Double]("p_raw"), r.getAs[Double]("share"),
        r.getAs[Double]("boost")))
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9)
    // the defining properties of √-flattening (NOT "between raw and
    // uniform" — Jensen's inequality lets a near-uniform domain overshoot
    // uniform when the rest are skewed): (a) order is preserved, (b)
    // pairwise share RATIOS contract — s_i/s_j = √(p_i/p_j), up to the
    // integer-sqrt quantization
    rows.foreach { case (p, s, boost) =>
      assert(math.abs(boost - s / p) < 1e-9)
    }
    for (Seq(a, b) <- rows.toSeq.combinations(2)) {
      assert((a._1 - b._1) * (a._2 - b._2) >= -1e-9,
        s"flattening must preserve order: $a vs $b")
      if (a._1 > 0 && b._1 > 0) {
        // tolerance: w = floor(√chars) quantization — at sf0.001 cell
        // sizes (√chars ≈ 35-40) each weight carries up to ~1/35 relative
        // error, so a ratio of two carries up to ~6 %
        val pr = a._1 / b._1
        val sr = a._2 / b._2
        assert(math.abs(sr - math.sqrt(pr)) < 0.06 * math.sqrt(pr),
          s"share ratio $sr must be ~sqrt of raw ratio $pr")
      }
    }
  }
}
