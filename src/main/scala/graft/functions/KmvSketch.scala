package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_kmv(h)` — the K-minimum-values (bottom-k / theta) distinct
  * sketch of a group of 64-bit hashes: the k smallest DISTINCT hash
  * values, emitted as a sorted `array<bigint>`.
  *
  * Why KMV next to the built-in HLL (`approx_count_distinct`): KMV
  * sketches COMPOSE UNDER SET OPERATIONS. The k smallest of A ∪ B are a
  * subset of (k smallest of A) ∪ (k smallest of B), so union is an array
  * merge; and every element of A ∩ B below θ = min(θ_A, θ_B) survives in
  * BOTH sketches, so the intersection estimate is
  * `|A_k ∩ B_k| / θ` — a sorted-merge intersect over two k-arrays (the
  * existing `graft_sorted_and_count` kernel). HLLs cannot intersect
  * without inclusion–exclusion error blowup. This is the cohort-overlap
  * / cross-segment-audience primitive at 100 TB: one pass builds a
  * 2 KiB sketch per segment; every pairwise overlap after that is
  * sketch-only arithmetic, no re-scan, no distinct-join.
  *
  * Estimator (Bar-Yossef et al., "Counting distinct elements in a data
  * stream"): with u_k = the k-th smallest hash mapped to (0,1),
  * D̂ = (k−1)/u_k, relative error ~ 1/√(k−2). Sparse mode: fewer than k
  * distinct hashes means the sketch IS the value set — estimates are
  * exact, intersections/unions are exact set ops.
  *
  * Mergeable: merge = insert b's values into a's bounded set (min-k of
  * a multiset union) — associative, commutative, duplicate-insensitive,
  * so map-side partial aggregation is exact, the shuffle carries ≤ k
  * longs per group, and the result is INVARIANT to partitioning (the k
  * smallest distinct values do not depend on arrival order).
  */
case class KmvSketch(
    child: Expression,
    k: Int = KmvSketch.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) {
      buf.add(h)
    } else if (h < buf.last()) {
      if (buf.add(h)) buf.remove(buf.last())
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out) // ascending — ready for the merge-scan kernel
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  /** The k every consumer must share: the estimator, theta and the
    * sparse/full classification in downstream Column arithmetic
    * (`qCohortOverlap`, `KmvSpec`) read the k-th array slot — a drifted
    * constant mis-estimates SILENTLY (a full sketch of a smaller k
    * classifies as sparse), so the width lives here once.
    */
  val DefaultK = 256
}
