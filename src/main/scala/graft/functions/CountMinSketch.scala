package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-min sketch [Cormode & Muthukrishnan 2005] as native kernels —
  * the frequency analog of the bloom bitset: `depth` rows of `width`
  * counters, each keyed by an independent splitmix64 stream; estimate =
  * min over rows, which can only OVER-estimate, so a `est ≥ t` filter
  * has NO false negatives and an exact count of the surviving candidates
  * restores exactness (the bloom-join pattern applied to heavy hitters).
  *
  * Build: [[CmsAgg]] (`graft_cms_agg`) — elementwise-sum merge keeps
  * map-side partial aggregation exact. Probe: [[CmsEstimate]]
  * (`graft_cms_min`), codegen'd, probe loop unrolled over a compile-time
  * depth.
  */
object CmsKernel {
  /** row-r probe position for hash h in a width-w (power of two) row —
    * splitmix64 streams 2.. (clear of the bloom kernel's streams 0/1).
    */
  def pos(h: Long, r: Int, width: Int): Int =
    (MinHash64.mix(h, r + 2) & (width - 1L)).toInt

  def estimate(counters: ArrayData, h: Long, depth: Int): Long = {
    val width = counters.numElements() / depth
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counters.getLong(r * width + pos(h, r, width))
      if (c < est) est = c
      r += 1
    }
    est
  }
}

/** `graft_cms_agg(h, width, depth)` — aggregate 64-bit hashes into a
  * count-min sketch (`array<bigint>`, depth×width counters). Width must
  * be a power of two; both shape arguments are plan-time literals (sketch
  * size is config, never data-dependent).
  */
case class CmsAgg(
    child: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(width >= 64 && (width & (width - 1)) == 0,
    s"graft_cms_agg width must be a power of two >= 64, got $width")
  require(depth >= 1 && depth <= 8,
    s"graft_cms_agg depth must be in [1,8], got $depth")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_agg requires bigint input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        buf(r * width + CmsKernel.pos(h, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsAgg =
    copy(child = newChild)
}

/** `graft_cms_min(counters, h, depth)` — the count-min estimate (min over
  * rows). Width is derived from the array length, so the probe stays
  * consistent with whatever sizing built the sketch.
  */
case class CmsEstimate(left: Expression, right: Expression, depth: Int)
  extends BinaryExpression {

  require(depth >= 1 && depth <= 8,
    s"graft_cms_min depth must be in [1,8], got $depth")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_min requires (array<bigint>, bigint), got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_min"

  override protected def nullSafeEval(cAny: Any, hAny: Any): Any =
    CmsKernel.estimate(cAny.asInstanceOf[ArrayData], hAny.asInstanceOf[Long], depth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (counters, h) => {
      val w = ctx.freshName("w")
      val r = ctx.freshName("r")
      val z = ctx.freshName("z")
      val c = ctx.freshName("c")
      val est = ctx.freshName("est")
      val pos = ctx.freshName("pos")
      // splitmix64 finalizer over (h + C(r+2)) — same constants as
      // CmsKernel.pos; the per-row additive seed comes from the
      // golden-gamma schedule indexed r+2
      s"""
         |int $w = $counters.numElements() / $depth;
         |long $est = Long.MAX_VALUE;
         |for (int $r = 0; $r < $depth; $r++) {
         |  long $z = $h + ${MinHash64.C(0)}L * ($r + 3L);
         |  $z = ($z ^ ($z >>> 30)) * ${0xBF58476D1CE4E5B9L}L;
         |  $z = ($z ^ ($z >>> 27)) * ${0x94D049BB133111EBL}L;
         |  $z = $z ^ ($z >>> 31);
         |  int $pos = (int) ($z & ($w - 1L));
         |  long $c = $counters.getLong($r * $w + $pos);
         |  if ($c < $est) $est = $c;
         |}
         |${ev.value} = $est;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsFunctions {
  import KernelShapes.foldableInt
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_agg",
      { exprs: Seq[Expression] =>
        require(exprs.length == 3, "graft_cms_agg takes (h, width, depth)")
        CmsAgg(exprs.head, foldableInt(exprs(1), "width"),
          foldableInt(exprs(2), "depth"))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_min",
      { exprs: Seq[Expression] =>
        require(exprs.length == 3, "graft_cms_min takes (counters, h, depth)")
        CmsEstimate(exprs.head, exprs(1), foldableInt(exprs(2), "depth"))
      },
      "built-in")
  }
}
