package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The banded-SRP layout ([[DedupQueries.SrpShape]]) and the wide
  * corpus-scale face `q_dedup_embedding_lsh64`. The layout invariants are
  * pinned because both the Spark plan AND the generated DuckDB oracle
  * derive band values from them — a silent layout bug would ship the same
  * wrong bands to both engines and still hash-green.
  */
class SrpShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("SrpShape rejects shapes that straddle a packed word or mismatch") {
    intercept[IllegalArgumentException] {
      DedupQueries.SrpShape(planes = 33, bands = 8, rowsPerBand = 4)
    }
    intercept[IllegalArgumentException] {
      DedupQueries.SrpShape(planes = 24, bands = 2, rowsPerBand = 12)
    }
    val wide = DedupQueries.Srp.Wide
    assert(wide.words === 2)
    // bands 0-3 live in word 0, bands 4-7 in word 1, 16-bit strides
    assert((0 until 8).map(wide.wordOf) === Seq(0, 0, 0, 0, 1, 1, 1, 1))
    assert((0 until 8).map(wide.shiftOf) === Seq(0, 16, 32, 48, 0, 16, 32, 48))
  }

  test("widening EXTENDS the plane stream: word 0 of the wide signature " +
      "is the narrow signature's planes continued, not a reseed") {
    // plane p is the same hyperplane in every shape — the wide signature's
    // low 32 bits must therefore equal the narrow 32-plane signature
    import org.apache.spark.sql.catalyst.util.ArrayData
    val dims = DedupQueries.Srp.Dims
    val v = ArrayData.toArrayData(
      Array.tabulate(dims)(d => math.sin(d + 1.0)))
    def mat(lo: Int, hi: Int): Array[Array[Double]] =
      (lo until hi).map(p =>
        (0 until dims).map(d =>
          DedupQueries.Srp.sign(p, d).toDouble).toArray).toArray
    val narrow = graft.functions.MatrixKernels.srpSig(v, mat(0, 32))
    val wide0 = graft.functions.MatrixKernels.srpSig(v, mat(0, 64))
    assert((wide0 & 0xFFFFFFFFL) === narrow)
  }

  test("srpPairs: growing bands at fixed rowsPerBand only ADDS pairs " +
      "(the global plane stream makes narrow shapes a prefix of wide ones)") {
    def pairs(bands: Int, rpb: Int): Set[(Long, Long)] =
      DedupQueries.srpPairs(spark, sf, bands, rpb)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b4r16 = pairs(4, 16)
    val b8r16 = pairs(8, 16) // == Srp.Wide
    assert(b4r16.subsetOf(b8r16),
      s"4x16 found pairs 8x16 missed: ${b4r16 -- b8r16}")
    val b8r8 = pairs(8, 8)
    val b16r8 = pairs(16, 8)
    assert(b8r8.subsetOf(b16r8),
      s"8x8 found pairs 16x8 missed: ${b8r8 -- b16r8}")
  }

  test("q_dedup_embedding_lsh64: every reported pair is ordered, distinct, " +
      "and exact-cosine-qualified (the verify stage is not band trust)") {
    val out = DedupQueries.qDedupEmbeddingLsh64(spark, sf).collect()
    assert(out.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length
      === out.length)
    assert(out.forall(_.getAs[Double]("cos") >= 0.46))
    // and each reported pair must also appear in the exact all-pairs
    // baseline (banding can only LOSE pairs, never invent them)
    val exact = DedupQueries.qDedupEmbedding(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.forall(r => exact((r.getLong(0), r.getLong(1)))))
  }
}
