package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization primitives (Jégou/Douze/Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search"): split a `dim`-vector
  * into `m` subvectors of `dim/m`, quantize each against its own
  * `ksub`-entry codebook. A 64-float vector becomes `m` small integer
  * codes — 32× less resident data than the raw floats — and
  * asymmetric-distance (ADC) scoring estimates dot products from a
  * per-query lookup table without touching the raw corpus vectors.
  *
  * Both expressions are single fused codegen'd passes (the [[IvfScores]]
  * pattern): the compositional HOF form would run interpreted (boxed
  * lambda per element) and, with m × ksub × subDim literal leaves, blow
  * past the JIT method-size cliff (BENCH_NOTES r11).
  *
  * Determinism (both engines replay bit-for-bit):
  *   - subspace distances are left-to-right IEEE double sums of
  *     `(x − c)²`, rounded to 6 decimals (Spark round semantics) BEFORE
  *     the argmin; ties break to the smaller code — [[AnnIvf]]'s
  *     assignment discipline.
  *   - LUT entries are left-to-right sub-dots quantized to integer 1e-6
  *     (`floor(s·10⁶ + 0.5)`) — the q90 discipline, so ADC scores are
  *     exact-integer sums.
  */
object PqCompute {

  /** Spark's round(_, 6) for doubles (RoundBase's BigDecimal path). */
  def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Widened copy of a float array, or null on null/any-null-element. */
  private def widen(v: ArrayData, expectLen: Int): Array[Double] = {
    if (v == null || v.numElements() != expectLen) return null
    val n = v.numElements()
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = v.getFloat(i).toDouble; i += 1 }
    out
  }

  /** codes(j) = argmin_r round6(Σ_d (x_jd − c_jrd)²), tie → min r. */
  def encode(v: ArrayData, cb: Array[Array[Array[Double]]],
      subDim: Int): ArrayData = {
    val m = cb.length
    val x = widen(v, m * subDim)
    if (x == null) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cbj = cb(j)
      var best = Double.MaxValue
      var bestR = 0
      var r = 0
      while (r < cbj.length) {
        val c = cbj(r)
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          val diff = x(j * subDim + d) - c(d)
          acc += diff * diff
          d += 1
        }
        val dist = round6(acc)
        if (dist < best) { best = dist; bestR = r }
        r += 1
      }
      codes(j) = bestR
      j += 1
    }
    new GenericArrayData(codes.map(c => c: Any))
  }

  /** lut(j·ksub + r) = floor((Σ_d q_jd · c_jrd) · 10⁶ + 0.5) as long. */
  def lut(v: ArrayData, cb: Array[Array[Array[Double]]],
      subDim: Int): ArrayData = {
    val m = cb.length
    val q = widen(v, m * subDim)
    if (q == null) return null
    val ksub = if (m == 0) 0 else cb(0).length
    val out = new Array[Any](m * ksub)
    var j = 0
    while (j < m) {
      val cbj = cb(j)
      var r = 0
      while (r < ksub) {
        val c = cbj(r)
        var acc = 0.0
        var d = 0
        while (d < subDim) { acc += q(j * subDim + d) * c(d); d += 1 }
        out(j * ksub + r) = math.floor(acc * 1000000.0 + 0.5).toLong
        r += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `pq_encode(vec)` → array<int> of `m` codes; NULL on null vector,
  * null element, or length ≠ m·subDim. Codebook baked as a literal.
  */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]],
    subDim: Int)
    extends UnaryExpression {

  require(codebook.nonEmpty && codebook.forall(_.nonEmpty) &&
    codebook.forall(_.forall(_.length == subDim)),
    "codebook must be m x ksub x subDim")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    PqCompute.encode(
      if (v == null) null else v.asInstanceOf[ArrayData], cb, subDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[][][]")
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.functions.PqCompute.encode(
        |    ${childGen.isNull} ? null : ${childGen.value}, $cbRef, $subDim);
        |boolean ${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_lut(qvec)` → array<long> of m·ksub quantized sub-dots; NULL on
  * null/dirty/mismatched query vector. Codebook baked as a literal.
  */
case class PqLut(child: Expression, codebook: Seq[Seq[Seq[Double]]],
    subDim: Int)
    extends UnaryExpression {

  require(codebook.nonEmpty && codebook.forall(_.nonEmpty) &&
    codebook.forall(_.forall(_.length == subDim)),
    "codebook must be m x ksub x subDim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    PqCompute.lut(
      if (v == null) null else v.asInstanceOf[ArrayData], cb, subDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[][][]")
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.functions.PqCompute.lut(
        |    ${childGen.isNull} ? null : ${childGen.value}, $cbRef, $subDim);
        |boolean ${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqFunctions {

  /** PQ codes of a float-vector column — see [[PqEncode]]. */
  def pqEncode(v: Column, codebook: Seq[Seq[Seq[Double]]], subDim: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), codebook, subDim))

  /** Per-query quantized ADC lookup table — see [[PqLut]]. */
  def pqLut(v: Column, codebook: Seq[Seq[Seq[Double]]], subDim: Int): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(v), codebook, subDim))
}
