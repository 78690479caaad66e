package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_minhash64(h)` — the 64-permutation MinHash signature of a group
  * of hashes as ONE aggregate: buffer = 64 longs, update = one primitive
  * loop applying 64 cheap bijective mixes of the input hash and folding
  * min.
  *
  * Why an aggregate and not 64 `min()` columns: a 64-column aggregate
  * generates enormous Janino code (64 agg states × a ~6-node mix tree
  * each), and its one-time compile dominates single-pass pipelines —
  * measured ~12s of a ~20s cold run at sf0.1. This operator keeps the
  * plan one node wide, runs as ObjectHashAggregate with partial
  * aggregation (map-side combine before the shuffle — the 100 TB
  * property), and the update loop is compiled Scala, not an interpreted
  * lambda.
  *
  * Mix p = the full splitmix64 finalizer seeded with a per-permutation
  * additive constant (golden-gamma stream). An earlier xor/xorshift-only
  * variant was GF(2)-LINEAR: with shift amounts repeating every 23
  * permutations, perm p+23 equaled perm p XOR a constant, correlating
  * the "independent" permutations and biasing LSH band recall (a missed
  * true pair cannot be recovered by the exact verifier). splitmix64's
  * multiply rounds break the linearity; each permutation is an
  * independent high-quality bijection.
  */
case class MinHash64(
    child: Expression,
    numPerms: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = s"graft_minhash$numPerms"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var p = 0
      while (p < numPerms) {
        val m = MinHash64.mix(h, p)
        if (m < buf(p)) buf(p) = m
        p += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < numPerms) {
      if (b(p) < a(p)) a(p) = b(p)
      p += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numPerms * 8)
    var p = 0
    while (p < numPerms) { bb.putLong(buf(p)); p += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHash64 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHash64 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}

object MinHash64 {
  val NumPerms = 64

  /** widest registered signature (permutation seeds precomputed to here) */
  val MaxPerms = 256

  /** per-permutation additive seeds: golden-gamma stream (plan-time). */
  val C: Array[Long] = Array.tabulate(MaxPerms)(p =>
    0x9E3779B97F4A7C15L * (p + 1L))

  /** splitmix64 finalizer over (h + C(p)) — an independent bijection per
    * permutation. Public so the spec can recompute expected signatures.
    */
  def mix(h: Long, p: Int): Long = {
    var z = h + C(p)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
