package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native vector kernels as Catalyst expressions with `doGenCode` — the
  * SURVEY.md §7.3 preference-(b) path for operators whose inner loop is too
  * hot for higher-order-function lambdas (interpreted per element) or
  * unrolled expression trees (blow past the JIT/codegen method limits at
  * dim ≥ ~64).
  *
  * `graft_dot(a, b)`: Σ a[i]·b[i] over two `array<double>` columns as one
  * primitive-typed loop inside whole-stage codegen — no boxing, no
  * per-element virtual dispatch, ascending-index summation (bit-identical
  * to a sequential fold, which is what the DuckDB oracle computes).
  *
  * At 100 TB this is the verification kernel of the similarity/dedup
  * pipelines: candidate pruning (LSH banding / IVF pruning) bounds the pair
  * count, and this expression bounds the per-pair cost.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** `graft_bitset_and_count(a, b)`: Σᵢ bit_count(a[i] & b[i]) over two
  * `array<bigint>` bitset signatures — the intersection cardinality of two
  * bitsets in one codegen'd primitive loop.
  *
  * Motivation (measured, sf0.001): expressing the same popcount sum as an
  * unrolled `bit_count(aw0 & bw0) + …` column chain makes the optimizer
  * (constraint propagation + commutative canonicalization over the 2·W
  * attributes) super-linear — the plan never finishes optimizing at W=32
  * words. One opaque expression over two array columns keeps the tree O(1)
  * and the inner loop branch-free.
  */
case class BitsetAndCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bitset_and_count requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_bitset_and_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitsetAndCount =
    copy(left = newLeft, right = newRight)
}

/** `graft_bitset_count(a)`: Σᵢ bit_count(a[i]) — bitset cardinality. */
case class BitsetCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_bitset_count requires array<bigint> input, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_bitset_count"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += java.lang.Long.bitCount(x.getLong(i))
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += java.lang.Long.bitCount($a.getLong($i));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BitsetCount =
    copy(child = newChild)
}

object VectorFunctions {

  /** Idempotently register `graft_dot` in the session's function registry
    * so it is usable from both the Column API and `spark.sql`.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "graft_dot takes exactly 2 arguments")
        ArrayDotProduct(exprs.head, exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bitset_and_count",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2,
          "graft_bitset_and_count takes exactly 2 arguments")
        BitsetAndCount(exprs.head, exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bitset_count",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_bitset_count takes exactly 1 argument")
        BitsetCount(exprs.head)
      },
      "built-in")
  }

  /** Σ a[i]·b[i] as a codegen'd primitive loop. */
  def dot(spark: SparkSession, a: String, b: String): Column = {
    register(spark)
    expr(s"graft_dot($a, $b)")
  }
}
