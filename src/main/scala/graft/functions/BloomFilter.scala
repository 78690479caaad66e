package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Shared bloom-filter math: K probe positions per key via double hashing
  * [Kirsch & Mitzenmacher, "Less Hashing, Same Performance"] — two
  * splitmix64-derived base hashes, probe p = h1 + k·h2. The bit-space
  * size is a power of two so position = probe & (bits−1).
  *
  * Build side: [[BloomAgg]] (`graft_bloom_agg`), an ObjectHashAggregate
  * with map-side partial merge (OR is associative/commutative/idempotent,
  * so partial aggregation is exact). Probe side: [[BloomContains]]
  * (`graft_bloom_contains`), a codegen'd scalar that runs inside
  * whole-stage codegen on the fact-table scan — the semi-join-reduction
  * shape: broadcast KB–MB of bits instead of shuffling the fact table
  * against the dimension keys. No false negatives, so a downstream real
  * join restores exactness; false positives only cost wasted rows.
  */
object BloomKernel {
  /** splitmix64 streams 0 and 1 (reusing the MinHash seed schedule); h2
    * is forced odd so all K probes stay distinct in a power-of-2 space.
    */
  def h1(h: Long): Long = MinHash64.mix(h, 0)
  def h2(h: Long): Long = MinHash64.mix(h, 1) | 1L

  def contains(bits: ArrayData, h: Long, numHashes: Int): Boolean = {
    val nbits = bits.numElements().toLong << 6
    val a = h1(h)
    val b = h2(h)
    var k = 0
    while (k < numHashes) {
      val pos = (a + k.toLong * b) & (nbits - 1)
      if ((bits.getLong((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L)
        return false
      k += 1
    }
    true
  }
}

/** `graft_bloom_agg(h, numBits, numHashes)` — aggregate a group of 64-bit
  * hashes into a bloom-filter bitset (`array<bigint>`, numBits/64 words).
  * numBits must be a power of two ≥ 64; both shape arguments are
  * plan-time literals (the filter size is a CONFIG choice, never
  * data-dependent — sizing it from a count() would put a driver job on
  * the plan path).
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"graft_bloom_agg numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"graft_bloom_agg numHashes must be in [1,16], got $numHashes")

  private val numWords = numBits / 64

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg requires bigint input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val a = BloomKernel.h1(h)
      val b = BloomKernel.h2(h)
      var k = 0
      while (k < numHashes) {
        val pos = (a + k.toLong * b) & (numBits - 1L)
        buf((pos >>> 6).toInt) |= 1L << (pos & 63L).toInt
        k += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numWords) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numWords * 8)
    var i = 0
    while (i < numWords) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numWords)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `graft_bloom_contains(bits, h, numHashes)` — membership probe against a
  * [[BloomAgg]] bitset. numHashes rides as a case-class parameter (from a
  * plan-time literal) so the probe loop unrolls with a compile-time
  * constant; the generated code is a handful of long ops fully inside
  * whole-stage codegen.
  */
@ExpressionDescription(usage = "graft_bloom_contains(bits, h, k)")
case class BloomContains(left: Expression, right: Expression, numHashes: Int)
  extends BinaryExpression {

  require(numHashes >= 1 && numHashes <= 16,
    s"graft_bloom_contains numHashes must be in [1,16], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires (array<bigint>, bigint), got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(bitsAny: Any, hAny: Any): Any =
    BloomKernel.contains(
      bitsAny.asInstanceOf[ArrayData], hAny.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, h) => {
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val pos = ctx.freshName("pos")
      val nbits = ctx.freshName("nbits")
      val ok = ctx.freshName("ok")
      val z = ctx.freshName("z")
      // inline splitmix64 finalizer for streams 0/1 — identical constants
      // to MinHash64.mix (golden-gamma additive seeds)
      s"""
         |long $z = $h + ${MinHash64.C(0)}L;
         |$z = ($z ^ ($z >>> 30)) * ${0xBF58476D1CE4E5B9L}L;
         |$z = ($z ^ ($z >>> 27)) * ${0x94D049BB133111EBL}L;
         |long $a = $z ^ ($z >>> 31);
         |$z = $h + ${MinHash64.C(1)}L;
         |$z = ($z ^ ($z >>> 30)) * ${0xBF58476D1CE4E5B9L}L;
         |$z = ($z ^ ($z >>> 27)) * ${0x94D049BB133111EBL}L;
         |long $b = ($z ^ ($z >>> 31)) | 1L;
         |long $nbits = ((long) $bits.numElements()) << 6;
         |boolean $ok = true;
         |for (int $k = 0; $k < $numHashes; $k++) {
         |  long $pos = ($a + (long) $k * $b) & ($nbits - 1L);
         |  if (($bits.getLong((int) ($pos >>> 6)) & (1L << (int) ($pos & 63L))) == 0L) {
         |    $ok = false; break;
         |  }
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

/** Shared registration helper for sketch kernels whose shape arguments
  * must be plan-time literals.
  */
private[functions] object KernelShapes {
  def foldableInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }
}

object BloomFunctions {
  import KernelShapes.foldableInt
  /** Idempotently register the bloom kernels for Column-API + `spark.sql`
    * use. Shape arguments must be foldable literals.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      { exprs: Seq[Expression] =>
        require(exprs.length == 3, "graft_bloom_agg takes (h, numBits, numHashes)")
        BloomAgg(exprs.head, foldableInt(exprs(1), "numBits"),
          foldableInt(exprs(2), "numHashes"))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      { exprs: Seq[Expression] =>
        require(exprs.length == 3, "graft_bloom_contains takes (bits, h, numHashes)")
        BloomContains(exprs.head, exprs(1), foldableInt(exprs(2), "numHashes"))
      },
      "built-in")
  }
}
