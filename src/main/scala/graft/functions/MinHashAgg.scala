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

/** `graft_simhash32(h)` — the 32-bit bit-majority SimHash sketch of a
  * group of hashes as ONE aggregate: buffer = 32 counters, update = one
  * primitive bit-test loop, eval packs the majority signs into a long.
  *
  * Why an aggregate and not 32 `sum(CASE WHEN (h >> i) & 1 …)` columns:
  * same reason as [[MinHash64]] — 32 aggregate states × a conditional
  * expression tree each generates Janino code whose one-time compile
  * dominates the query (measured: the wide-sum form was the #1 bench line
  * at 50 s before banding, still multi-second after). One
  * ObjectHashAggregate node with map-side partial merge is the 100 TB
  * shape.
  */
case class SimHash32(
    child: Expression,
    bits: Int = 32,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  require(bits >= 1 && bits <= 64, s"simhash width must be 1..64, got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint input, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = s"graft_simhash$bits"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        buf(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < bits) { a(i) += b(i); i += 1 }
    a
  }

  /** majority sign per bit, packed — `> 0` matches the SQL-sum oracle */
  override def eval(buf: Array[Int]): Any = {
    var s = 0L
    var i = 0
    while (i < bits) { if (buf(i) > 0) s |= 1L << i; i += 1 }
    s
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bits * 4)
    var i = 0
    while (i < bits) { bb.putInt(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHash32 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHash32 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
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
