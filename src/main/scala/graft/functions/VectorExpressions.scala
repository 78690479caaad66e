package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

/** `graft_sorted_and_count(a, b)`: |A ∩ B| for two ASCENDING-sorted
  * `array<bigint>` sets via a single merge scan — O(|a|+|b|), no hash set,
  * no allocation, inside whole-stage codegen. The exact-verification
  * kernel for LSH candidate pairs when per-doc sets are kept as sorted
  * hash arrays (`sort_array(collect_set(xxhash64(…)))`): unlike the
  * global-dictionary bitset path it needs no driver-side vocabulary scan,
  * so plan construction stays job-free.
  */
case class SortedAndCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_and_count requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sorted_and_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val n = ctx.freshName("n")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $n++; $i++; $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedAndCount =
    copy(left = newLeft, right = newRight)
}

/** Shared runtime helper for [[PolyHash]] — kept as a static-shaped method
  * so generated code calls it directly (one static call per row, no
  * boxing, no lambda dispatch).
  */
object PolyHashImpl {
  /** acc₀=7; acc = (acc·31 + codePoint) mod (2³¹−1) over the string's code
    * points — exactly the fold `aggregate(split(s, ''), 7L, (acc, c) ->
    * (acc * 31 + ascii(c)) % 2147483647)` computes for BMP text (split('')
    * yields one char per element; `ascii` is the leading code point).
    */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 7L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }

  /** An INDEPENDENT second 31-bit polynomial stream (seed 11, modulus
    * 2³¹−19, also prime): paired with [[hash]] it yields 60+ reproducible
    * bits for the wide-sketch operators (`graft_simhash60`) without
    * needing a cross-engine 64-bit hash — both streams replay exactly in
    * DuckDB as BIGINT-safe folds (acc·31 + cp < 2³⁶).
    */
  def hash2(s: UTF8String): Long = {
    val str = s.toString
    var acc = 11L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % 2147483629L
      i += Character.charCount(cp)
    }
    acc
  }
}

/** `graft_poly_hash(s)`: Karp–Rabin polynomial hash of a string — the
  * shared shingle/fingerprint hash of the dedup + text suites. The HOF
  * spelling (`aggregate(split(s, ''), …)`) materializes a per-char array
  * and evaluates the lambda interpreted per element; this kernel is one
  * static call per row.
  */
case class PolyHash(child: Expression, stream: Int = 1)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String =
    if (stream == 1) "graft_poly_hash" else "graft_poly_hash2"

  private def impl = if (stream == 1) "hash" else "hash2"

  override protected def nullSafeEval(a: Any): Any =
    if (stream == 1) PolyHashImpl.hash(a.asInstanceOf[UTF8String])
    else PolyHashImpl.hash2(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PolyHashImpl.$impl($a)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Shared runtime helper for [[CdcBounds]] — the ROLLING form of
  * [[PolyHashImpl.hash]] over a sliding `w`-code-point window: one pass
  * per document (remove the leading code point's `c·31^{w−1}` term and the
  * seed's `7·31^w`, shift by 31, re-add seed and trailing code point — all
  * mod 2³¹−1), versus the O(len·w) per-window re-fold the HOF spelling
  * pays plus a substring allocation per position (measured 4.6 s → the
  * kernel's sub-second at sf0.1). Emits every 1-based position `i ≥ w`
  * where the window hash of code points `[i−w+1, i]` satisfies
  * `h % div == 0` — value-identical to
  * `graft_poly_hash(substring(text, i−w+1, w)) % div = 0`, which is what
  * the DuckDB oracle replays.
  */
object CdcBoundsImpl {
  private val P = 2147483647L

  def bounds(s: UTF8String, w: Int, div: Long): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    if (n >= w) {
      var pw1 = 1L // 31^(w-1) mod p
      var k = 0
      while (k < w - 1) { pw1 = pw1 * 31 % P; k += 1 }
      val seedPow = 7L * (pw1 * 31 % P) % P // 7·31^w mod p
      var h = 7L
      var j = 0
      while (j < w) { h = (h * 31 + cps(j)) % P; j += 1 }
      if (h % div == 0) out += w.toLong
      var i = w
      while (i < n) {
        var t = (h - seedPow + P) % P
        t = (t - cps(i - w) * pw1 % P + P) % P
        h = (t * 31 + seedPow + cps(i)) % P
        i += 1
        if (h % div == 0) out += i.toLong
      }
    }
    ArrayData.toArrayData(out.toArray)
  }
}

/** `graft_cdc_bounds(s)`: content-defined chunk boundary positions — see
  * [[CdcBoundsImpl.bounds]] (window 16, divisor 64, the
  * `TextQueries.qTextCdcChunks` parameters).
  */
case class CdcBounds(child: Expression, w: Int = 16, div: Long = 64L)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_cdc_bounds"

  override protected def nullSafeEval(a: Any): Any =
    CdcBoundsImpl.bounds(a.asInstanceOf[UTF8String], w, div)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.CdcBoundsImpl.bounds($a, $w, ${div}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcBounds =
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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_poly_hash",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_poly_hash takes exactly 1 argument")
        PolyHash(exprs.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cdc_bounds",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_cdc_bounds takes exactly 1 argument")
        CdcBounds(exprs.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_and_count",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2,
          "graft_sorted_and_count takes exactly 2 arguments")
        SortedAndCount(exprs.head, exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash64",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_minhash64 takes exactly 1 argument")
        MinHash64(exprs.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash32",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_simhash32 takes exactly 1 argument")
        SimHash32(exprs.head)
      },
      "built-in")
    // the corpus-scale sketch width (SCALE.md band-shape law): 60
    // reproducible bits from the two polynomial streams, banded 4×15 so
    // band-value cardinality (2¹⁵ per band) outruns corpus growth where
    // the 32-bit sketch's 8-bit bands (2⁸) go quadratic
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash60",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_simhash60 takes exactly 1 argument")
        SimHash32(exprs.head, bits = 60)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_poly_hash2",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_poly_hash2 takes exactly 1 argument")
        PolyHash(exprs.head, stream = 2)
      },
      "built-in")
    // wider signature for low-threshold LSH banding (r=4 × 32 bands keeps
    // the per-band miss exponent steep at j ≥ 0.7); same aggregate, same
    // permutation stream, just more slots
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash128",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_minhash128 takes exactly 1 argument")
        MinHash64(exprs.head, numPerms = 128)
      },
      "built-in")
    // the corpus-scale calibration (SCALE.md "band-shape law"): holding a
    // hard j ≥ 0.7 recall while keeping candidates linear needs r=8 with
    // b≈32 ⇒ 256 slots. Same aggregate, same permutation stream.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash256",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_minhash256 takes exactly 1 argument")
        MinHash64(exprs.head, numPerms = 256)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1 || exprs.length == 2,
          "graft_kmv takes 1 or 2 arguments (hash[, k])")
        if (exprs.length == 1) KmvSketch(exprs.head)
        else {
          require(exprs(1).foldable, "graft_kmv: k must be a literal")
          KmvSketch(exprs.head,
            k = exprs(1).eval(null).asInstanceOf[Number].intValue)
        }
      },
      "built-in")
    // codebook/centroid kernels (see MatrixExpressions.scala): matrices
    // ride as ONE foldable literal child, never as unrolled subtrees
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_argmin_dot",
      { exprs: Seq[Expression] =>
        require(exprs.length == 3, "graft_argmin_dot takes exactly 3 arguments")
        CodebookArgmin(exprs(0), exprs(1), exprs(2))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_probe_dot",
      { exprs: Seq[Expression] =>
        require(exprs.length == 3, "graft_probe_dot takes exactly 3 arguments")
        CentroidProbe(exprs(0), exprs(1), exprs(2))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_encode",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "graft_pq_encode takes exactly 2 arguments")
        PqEncodeExpr(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_lut",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "graft_pq_lut takes exactly 2 arguments")
        PqLutExpr(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_adc",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "graft_adc takes exactly 2 arguments")
        AdcScore(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_srp_sig",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "graft_srp_sig takes exactly 2 arguments")
        SrpSignature(exprs(0), exprs(1))
      },
      "built-in")
  }

  /** Σ a[i]·b[i] as a codegen'd primitive loop. */
  def dot(spark: SparkSession, a: String, b: String): Column = {
    register(spark)
    expr(s"graft_dot($a, $b)")
  }
}
