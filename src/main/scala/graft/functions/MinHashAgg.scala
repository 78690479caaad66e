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
  * Mix p (bijective, overflow-free — bit ops only):
  * `x = h ^ C(p); m = x ^ (x << S(p))` with C(p) a splitmix-derived odd
  * constant and S(p) = (p % 23) + 3. MinHash does not need high-grade
  * hash independence here because every LSH candidate is exact-verified
  * downstream; the band count governs recall.
  */
case class MinHash64(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash64 requires bigint input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash64"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(MinHash64.NumPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var p = 0
      while (p < MinHash64.NumPerms) {
        val x = h ^ MinHash64.C(p)
        val m = x ^ (x << MinHash64.S(p))
        if (m < buf(p)) buf(p) = m
        p += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < MinHash64.NumPerms) {
      if (b(p) < a(p)) a(p) = b(p)
      p += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(MinHash64.NumPerms * 8)
    var p = 0
    while (p < MinHash64.NumPerms) { bb.putLong(buf(p)); p += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(MinHash64.NumPerms)(bb.getLong())
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

  /** splitmix-derived per-permutation xor constants (plan-time). */
  val C: Array[Long] = Array.tabulate(NumPerms) { p =>
    var c = 0x9E3779B97F4A7C15L * (2L * p + 1L)
    c ^= c >>> 31
    c
  }

  /** xorshift amounts, coprime-ish spread over [3, 25]. */
  val S: Array[Int] = Array.tabulate(NumPerms)(p => (p % 23) + 3)

  /** The same mix as a SQL expression string over a bigint column — kept
    * for oracle parity: the DuckDB oracle replays this formula verbatim.
    */
  def mixSql(h: String, p: Int): String =
    s"(($h ^ ${C(p)}L) ^ shiftleft(($h ^ ${C(p)}L), ${S(p)}))"
}
