package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codebook/centroid kernels for the ANN suite (k-means IVF, PQ/ADC, SRP
  * sign-LSH), with the matrix data carried as ONE foldable literal child
  * (`typedlit` of the nested Seq) instead of unrolled expression subtrees.
  *
  * Why this shape (measured, round 4): spelling a 16-centroid argmin as 16
  * `struct(graft_dot(v, typedlit(c)) …)` branches — let alone the 8×16 PQ
  * LUT as 128 of them — generates codegen units so large that
  * Janino + JIT compilation dominates the query (q_knn_pq spent ~10 of its
  * 12 s compiling), and every k-means iteration embeds NEW centroid
  * literals, so each iteration is a fresh never-cached codegen class. With
  * the matrix as a literal child, the generated SOURCE is identical across
  * iterations/queries (the matrix lives in the `references` array), so the
  * codegen cache hits and the per-row work is a tight primitive loop.
  *
  * All kernels preserve the floating-point evaluation order of the
  * expression trees they replace (ascending-index dot products,
  * `‖c‖² − 2·v·c` with the subtraction last, lexicographic (distance, id)
  * tie-breaks), so results are bit-identical to round 4's.
  */
object MatrixData {

  /** Extract a 3-level `array<array<array<double>>>` literal into JVM
    * arrays (evaluated once per expression instance, driver- or
    * executor-side).
    */
  def books3(e: Expression): Array[Array[Array[Double]]] = {
    val a = e.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements()) { j =>
      val b = a.getArray(j)
      Array.tabulate(b.numElements()) { c =>
        b.getArray(c).toDoubleArray()
      }
    }
  }

  /** Extract a 2-level `array<array<double>>` literal. */
  def mat2(e: Expression): Array[Array[Double]] = {
    val a = e.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i => a.getArray(i).toDoubleArray())
  }

  /** ‖c‖² per codebook row, same summation order as the plan-literal
    * version (`c.map(x => x*x).sum` — ascending).
    */
  def norms(books: Array[Array[Array[Double]]]): Array[Array[Double]] =
    books.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })

  def isDoubleArray2(dt: DataType): Boolean = dt match {
    case ArrayType(ArrayType(DoubleType, _), _) => true
    case _ => false
  }

  def isDoubleArray3(dt: DataType): Boolean = dt match {
    case ArrayType(inner, _) => isDoubleArray2(inner)
    case _ => false
  }
}

/** Runtime kernels shared by interpreted eval and generated code — the
  * generated code is ONE static call per row, so the codegen unit stays
  * tiny and identical across centroid refreshes.
  */
object MatrixKernels {

  /** argmin over books(sel) of ‖c‖² − 2·v·c (ties → lowest c). */
  def argminDot(sel: Int, v: ArrayData, books: Array[Array[Array[Double]]],
      norms: Array[Array[Double]]): Int = {
    val book = books(sel)
    val nrm = norms(sel)
    var best = Double.MaxValue
    var bestC = 0
    var c = 0
    while (c < book.length) {
      val cent = book(c)
      val n = math.min(v.numElements(), cent.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * cent(i); i += 1 }
      val d = nrm(c) - 2.0 * dot
      if (d < best) { best = d; bestC = c }
      c += 1
    }
    bestC
  }

  /** The `nprobe` nearest centroid ids, ascending by (distance, id). */
  def probe(v: ArrayData, book: Array[Array[Double]], nrm: Array[Double],
      nprobe: Int): ArrayData = {
    val k = book.length
    val d = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = book(c)
      val n = math.min(v.numElements(), cent.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * cent(i); i += 1 }
      d(c) = nrm(c) - 2.0 * dot
      c += 1
    }
    val m = math.min(nprobe, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      var best = Double.MaxValue
      var bestC = -1
      c = 0
      while (c < k) {
        if (!taken(c) && d(c) < best) { best = d(c); bestC = c }
        c += 1
      }
      // every distance NaN (a NaN element poisons all dots): fall back to
      // the lowest untaken id — deterministic, and matching argminDot's
      // bestC=0 default — instead of the bare taken(-1) crash
      if (bestC < 0) {
        c = 0
        while (taken(c)) c += 1
        bestC = c
      }
      taken(bestC) = true
      out(r) = bestC
      r += 1
    }
    new GenericArrayData(out)
  }

  /** PQ encode: code per subspace j = argmin over books(j) of
    * ‖c‖² − 2·v[j·dsub..]·c — indexes `v` at subspace offsets directly (no
    * per-row slice allocation).
    */
  def pqEncode(v: ArrayData, books: Array[Array[Array[Double]]],
      norms: Array[Array[Double]]): ArrayData = {
    val m = books.length
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      val nrm = norms(j)
      val dsub = book(0).length
      val off = j * dsub
      var best = Double.MaxValue
      var bestC = 0
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dot = 0.0
        var i = 0
        while (i < dsub) { dot += v.getDouble(off + i) * cent(i); i += 1 }
        val d = nrm(c) - 2.0 * dot
        if (d < best) { best = d; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Per-query ADC lookup table: lut[j][c] = ‖c‖² − 2·q[j·dsub..]·c. */
  def pqLut(v: ArrayData, books: Array[Array[Array[Double]]],
      norms: Array[Array[Double]]): ArrayData = {
    val m = books.length
    val rows = new Array[ArrayData](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      val nrm = norms(j)
      val dsub = book(0).length
      val off = j * dsub
      val row = new Array[Double](book.length)
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dot = 0.0
        var i = 0
        while (i < dsub) { dot += v.getDouble(off + i) * cent(i); i += 1 }
        row(c) = nrm(c) - 2.0 * dot
        c += 1
      }
      rows(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  /** Σ_j lut[j][codes[j]] — ascending j, matching the former
    * left-associated `element_at` chain.
    */
  def adc(lut: ArrayData, codes: ArrayData): Double = {
    val m = math.min(lut.numElements(), codes.numElements())
    var s = 0.0
    var j = 0
    while (j < m) {
      s += lut.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    s
  }

  /** Packed SRP signature: bit p = 1 iff Σ_d signs[p][d]·v[d] ≥ 0
    * (ascending-d summation — same order as `graft_dot(v, array(±1, …))`).
    */
  def srpSig(v: ArrayData, signs: Array[Array[Double]]): Long = {
    var sig = 0L
    var p = 0
    while (p < signs.length) {
      val plane = signs(p)
      val n = math.min(v.numElements(), plane.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * plane(i); i += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** `graft_argmin_dot(sel, v, books)` — nearest-centroid id within codebook
  * `books[sel]` (int selector column; `books` a foldable
  * array<array<array<double>>> literal). The k-means assignment and PQ
  * per-subspace assignment kernel.
  */
case class CodebookArgmin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == IntegerType &&
        second.dataType.isInstanceOf[ArrayType] &&
        second.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
        MatrixData.isDoubleArray3(third.dataType) && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_argmin_dot requires (int, array<double>, foldable array³<double>)")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_argmin_dot"

  @transient private lazy val books = MatrixData.books3(third)
  @transient private lazy val nrm = MatrixData.norms(books)

  override protected def nullSafeEval(s: Any, v: Any, b: Any): Any =
    MatrixKernels.argminDot(s.asInstanceOf[Int], v.asInstanceOf[ArrayData], books, nrm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("books", books, "double[][][]")
    val nRef = ctx.addReferenceObj("norms", nrm, "double[][]")
    nullSafeCodeGen(ctx, ev, (s, v, _) =>
      s"${ev.value} = graft.functions.MatrixKernels.argminDot($s, $v, $bRef, $nRef);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CodebookArgmin =
    copy(first = f, second = s, third = t)
}

/** `graft_probe_dot(v, cents, nprobe)` — the nprobe nearest centroid ids
  * (ascending by distance, ties by id) for multi-probe IVF search.
  */
case class CentroidProbe(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType.isInstanceOf[ArrayType] &&
        first.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
        MatrixData.isDoubleArray2(second.dataType) && second.foldable &&
        third.dataType == IntegerType && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_probe_dot requires (array<double>, foldable array²<double>, foldable int)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_probe_dot"

  @transient private lazy val cents = MatrixData.mat2(second)
  @transient private lazy val nrm = {
    val n = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      var s = 0.0; var i = 0
      while (i < cents(c).length) { s += cents(c)(i) * cents(c)(i); i += 1 }
      n(c) = s; c += 1
    }
    n
  }
  @transient private lazy val np = third.eval(null).asInstanceOf[Int]

  override protected def nullSafeEval(v: Any, c: Any, n: Any): Any =
    MatrixKernels.probe(v.asInstanceOf[ArrayData], cents, nrm, np)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val nRef = ctx.addReferenceObj("norms", nrm, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"${ev.value} = graft.functions.MatrixKernels.probe($v, $cRef, $nRef, $np);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CentroidProbe =
    copy(first = f, second = s, third = t)
}

/** `graft_pq_encode(v, books)` — the M one-byte PQ codes of a vector. */
case class PqEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
        left.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
        MatrixData.isDoubleArray3(right.dataType) && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_pq_encode requires (array<double>, foldable array³<double>)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val books = MatrixData.books3(right)
  @transient private lazy val nrm = MatrixData.norms(books)

  override protected def nullSafeEval(v: Any, b: Any): Any =
    MatrixKernels.pqEncode(v.asInstanceOf[ArrayData], books, nrm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("books", books, "double[][][]")
    val nRef = ctx.addReferenceObj("norms", nrm, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = graft.functions.MatrixKernels.pqEncode($v, $bRef, $nRef);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqEncodeExpr = copy(left = l, right = r)
}

/** `graft_pq_lut(v, books)` — a query's M×Ksub ADC lookup table (computed
  * once per query row on the broadcast side, ranking-equivalent to true
  * distances per Jégou et al.).
  */
case class PqLutExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
        left.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
        MatrixData.isDoubleArray3(right.dataType) && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_pq_lut requires (array<double>, foldable array³<double>)")

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  @transient private lazy val books = MatrixData.books3(right)
  @transient private lazy val nrm = MatrixData.norms(books)

  override protected def nullSafeEval(v: Any, b: Any): Any =
    MatrixKernels.pqLut(v.asInstanceOf[ArrayData], books, nrm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("books", books, "double[][][]")
    val nRef = ctx.addReferenceObj("norms", nrm, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = graft.functions.MatrixKernels.pqLut($v, $bRef, $nRef);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqLutExpr = copy(left = l, right = r)
}

/** `graft_adc(lut, codes)` — the 8-lookup asymmetric distance of a
  * (query LUT, corpus codes) pair.
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (MatrixData.isDoubleArray2(left.dataType) &&
        right.dataType.isInstanceOf[ArrayType] &&
        right.dataType.asInstanceOf[ArrayType].elementType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_adc requires (array<array<double>>, array<int>)")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc"

  override protected def nullSafeEval(l: Any, c: Any): Any =
    MatrixKernels.adc(l.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, c) =>
      s"${ev.value} = graft.functions.MatrixKernels.adc($l, $c);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): AdcScore = copy(left = l, right = r)
}

/** `graft_srp_sig(v, signs)` — the packed sign-LSH signature: bit p of the
  * result is the sign of hyperplane p's dot with `v`. Replaces 32 unrolled
  * `graft_dot(v, array(±1,…)) >= 0` subtrees with one loop over a literal
  * ±1 matrix; band extraction is then shift/mask arithmetic.
  */
case class SrpSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
        left.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
        MatrixData.isDoubleArray2(right.dataType) && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_srp_sig requires (array<double>, foldable array²<double>)")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp_sig"

  @transient private lazy val signs = MatrixData.mat2(right)

  override protected def nullSafeEval(v: Any, s: Any): Any =
    MatrixKernels.srpSig(v.asInstanceOf[ArrayData], signs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("signs", signs, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = graft.functions.MatrixKernels.srpSig($v, $sRef);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SrpSignature = copy(left = l, right = r)
}
