package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two `array<float>` / `array<double>`
  * columns, accumulated in double.
  *
  * This replaces the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` form the
  * similarity operators used through round 10. The higher-order form is
  * semantically right but runs interpreted: `ArrayTransform`/
  * `ArrayAggregate` are CodegenFallback expressions that allocate a
  * result array and box every element through the lambda variables — for
  * the LSH bucketing stage that's 64 hyperplane dots x dim 64 = 4096
  * boxed multiplies per vector. This expression is a single whole-stage-
  * codegen'd primitive loop over the two `ArrayData` (no intermediate
  * array, no boxing).
  *
  * Semantics are BIT-IDENTICAL to the higher-order form (the DuckDB
  * oracles and the streaming/batch parity specs depend on it):
  *   - accumulation is left-to-right `0.0 + x0*y0 + x1*y1 + ...` in
  *     IEEE double, each element widened from float exactly as
  *     `cast("double")` does;
  *   - mismatched lengths -> NULL (zip_with null-pads the short side, so
  *     the aggregate sum went NULL);
  *   - any NULL element -> NULL (the padded/NULL product poisoned the
  *     sum);
  *   - NULL array on either side -> NULL; two empty arrays -> 0.0.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // NULL on length mismatch / NULL element, even for non-null inputs
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (leftIsFloat) "getFloat" else "getDouble"
    val getR = if (rightIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.$getL($i) * (double) $b.$getR($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused random-hyperplane LSH bucketing: ALL L×H sign-bit dots of a
  * float-array column against the fixed hyperplane matrix, emitted as the
  * `array<struct<l:int, bucket:bigint>>` the LSH family explodes
  * ([[graft.ops.AnnLsh.bucketArray]]).
  *
  * Why fused: the compositional form — 64 separate [[VecDot]]s against 64
  * literal weight arrays, summed through 64 CASE WHENs inside one
  * generator expression — is all codegen'd, but the generated method is
  * enormous; HotSpot refuses to JIT methods past its bytecode limit, so
  * the whole projection runs as INTERPRETED bytecode (measured: 1.4–1.8 s
  * for 2,000 rows at sf0.1 — ~200× slower than the arithmetic warrants).
  * One compact loop here JITs fine.
  *
  * BIT-IDENTICAL to the compositional form:
  *   - each hyperplane dot is the same left-to-right double fold over the
  *     float elements (weights exact literals);
  *   - bit j of table l is set iff dot(v, w_{l,j}) >= 0 (NaN compares
  *     false, exactly like the double comparison it replaces);
  *   - a NULL vector, a vector whose length differs from `dim`, or one
  *     containing a NULL element made every per-hyperplane dot NULL in
  *     the zip_with form, so every CASE contributed 0 — reproduced as
  *     all-zero buckets for all L tables (the expression itself is
  *     NON-nullable, matching the old array(struct(...)) output).
  */
case class LshBucketKeys(child: Expression, weights: Seq[Double],
    tables: Int, bitsPerTable: Int, dim: Int)
    extends UnaryExpression {

  require(weights.length == tables * bitsPerTable * dim,
    s"weights must be tables*bitsPerTable*dim = ${tables * bitsPerTable * dim} doubles")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("l", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_bucket_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  @transient private lazy val wArr: Array[Double] = weights.toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    LshBucketKeys.compute(
      if (v == null) null else v.asInstanceOf[ArrayData],
      wArr, tables, bitsPerTable, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val wRef = ctx.addReferenceObj("lshWeights", wArr, "double[]")
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.functions.LshBucketKeys.compute(
        |    ${childGen.isNull} ? null : ${childGen.value},
        |    $wRef, $tables, $bitsPerTable, $dim);
       """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucketKeys {

  /** All L bucket keys in one pass; invalid vectors (null / wrong length
    * / null element) yield all-zero buckets — see the class doc.
    */
  def compute(v: ArrayData, w: Array[Double], tables: Int, bits: Int, dim: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val out = new Array[Any](tables)
    var valid = v != null && v.numElements() == dim
    if (valid) {
      var i = 0
      while (valid && i < dim) { if (v.isNullAt(i)) valid = false; i += 1 }
    }
    if (!valid) {
      var l = 0
      while (l < tables) { out(l) = new GenericInternalRow(Array[Any](l, 0L)); l += 1 }
      return new GenericArrayData(out)
    }
    val fv = new Array[Double](dim)
    var i = 0
    while (i < dim) { fv(i) = v.getFloat(i).toDouble; i += 1 }
    var l = 0
    while (l < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val off = (l * bits + j) * dim
        var acc = 0.0
        var k = 0
        while (k < dim) { acc += fv(k) * w(off + k); k += 1 }
        if (acc >= 0.0) bucket |= 1L << j
        j += 1
      }
      out(l) = new GenericInternalRow(Array[Any](l, bucket))
      l += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused IVF centroid scoring: the array of (score, -centroid_id)
  * structs [[graft.ops.AnnIvf]] ranks for assignment and probing, in one
  * JIT-friendly pass — the compositional form (nlist literal-array dots,
  * each divided, rounded, and packed into structs inside one expression
  * tree) hit the same HotSpot method-size interpretation cliff as
  * [[LshBucketKeys]].
  *
  * Parity with `struct(round(dot(v, w_c)/nrm_c, 6) AS s, -cid AS nc)`:
  *   - same left-to-right double fold per centroid;
  *   - `round(_, 6)` reproduced exactly (Spark's RoundBase: NaN/Infinite
  *     pass through, else BigDecimal.valueOf + HALF_UP);
  *   - a NULL vector, a length mismatch vs a centroid, or a NULL element
  *     made that centroid's dot NULL, so `s` is NULL for that struct
  *     while `nc` stays — reproduced field-for-field (the expression
  *     itself is non-nullable, like the array(struct(...)) it replaces).
  */
case class IvfScores(child: Expression, centroids: Seq[(Long, Seq[Double])],
    norms: Seq[Double])
    extends UnaryExpression {

  require(centroids.nonEmpty && centroids.length == norms.length,
    "centroids and norms must be non-empty and equal-length")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", DoubleType, nullable = true),
    StructField("nc", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "ivf_scores"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  @transient private lazy val ids: Array[Long] = centroids.map(_._1).toArray
  @transient private lazy val vecs: Array[Array[Double]] =
    centroids.map(_._2.toArray).toArray
  @transient private lazy val nrms: Array[Double] = norms.toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    IvfScores.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], ids, vecs, nrms)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val idsRef = ctx.addReferenceObj("ivfIds", ids, "long[]")
    val vecsRef = ctx.addReferenceObj("ivfVecs", vecs, "double[][]")
    val nrmsRef = ctx.addReferenceObj("ivfNrms", nrms, "double[]")
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.functions.IvfScores.compute(
        |    ${childGen.isNull} ? null : ${childGen.value},
        |    $idsRef, $vecsRef, $nrmsRef);
       """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfScores {

  /** Spark's round(_, 6) for doubles: NaN/Infinite pass through, else
    * shortest-decimal-repr HALF_UP (RoundBase's BigDecimal.valueOf path).
    */
  private def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(v: ArrayData, ids: Array[Long], cents: Array[Array[Double]],
      nrms: Array[Double]): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val k = ids.length
    val out = new Array[Any](k)
    val n = if (v == null) -1 else v.numElements()
    var anyNull = v == null
    if (!anyNull) {
      var i = 0
      while (!anyNull && i < n) { if (v.isNullAt(i)) anyNull = true; i += 1 }
    }
    var fv: Array[Double] = null
    if (!anyNull) {
      fv = new Array[Double](n)
      var i = 0
      while (i < n) { fv(i) = v.getFloat(i).toDouble; i += 1 }
    }
    var c = 0
    while (c < k) {
      val w = cents(c)
      // dot is NULL (-> s NULL) on null vector, any null element, or a
      // length mismatch with THIS centroid (zip_with null-padding)
      if (anyNull || w.length != n) {
        out(c) = new GenericInternalRow(Array[Any](null, -ids(c)))
      } else {
        var acc = 0.0
        var i = 0
        while (i < n) { acc += fv(i) * w(i); i += 1 }
        out(c) = new GenericInternalRow(Array[Any](round6(acc / nrms(c)), -ids(c)))
      }
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** Symmetric per-vector int8 scalar quantization of a float-array
  * embedding: `q_i = floor(x_i * (127 / max|x|) + 0.5)` packed into a
  * `binary` value, one byte per dimension — 4× smaller than float32.
  *
  * At 100 TB this is the memory story for similarity search: a quantized
  * corpus holds 4× more vectors per executor (or broadcasts 4× more
  * queries), and the integer dot ([[VecDotI8]]) runs in exact 64-bit
  * arithmetic, so any engine — Spark here, DuckDB in the oracle —
  * reproduces it bit-for-bit. Per-vector scales cancel in cosine, so
  * quantized cosine needs no dequantization.
  *
  * Determinism contract (the q82 oracle replays this in SQL):
  *   - `max|x|` and `x * scale` are IEEE double ops on exactly-widened
  *     floats — identical on any engine;
  *   - rounding is `floor(v + 0.5)` (ties toward +∞), NOT `round()`,
  *     sidestepping engine-dependent tie modes;
  *   - `max|x| = 0` (zero vector) → all-zero bytes;
  *   - NULL array, NULL element, or non-finite (NaN/±Inf) element →
  *     NULL (the [[VecDot]] null discipline).
  */
case class QuantizeI8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_quantize_i8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    QuantizeI8.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("qbytes")
      s"""
         |byte[] $r = graft.functions.QuantizeI8.compute($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeI8 {

  /** Null on null or non-finite element (NaN is checked per element —
    * `x > maxAbs` would silently skip it); all-zero bytes on a zero
    * vector; otherwise `(byte) floor(x_i * (127 / max|x|) + 0.5)`.
    */
  def compute(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = math.abs(v.getFloat(i).toDouble)
      if (x.isNaN || x.isInfinite) return null
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxAbs == 0.0) return out
    val scale = 127.0 / maxAbs
    i = 0
    while (i < n) {
      out(i) = math.floor(v.getFloat(i).toDouble * scale + 0.5).toByte
      i += 1
    }
    out
  }
}

/** Exact integer dot product of two int8-quantized vectors
  * ([[QuantizeI8]] binaries), accumulated in long. Length mismatch →
  * NULL (mirroring [[VecDot]]). Products are bounded by 127² per
  * element, so a 64-bit accumulator is exact to ~7·10¹⁴ dimensions —
  * any engine computes the identical value.
  */
case class VecDotI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot_i8"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    var acc = 0L
    var i = 0
    while (i < x.length) { acc += x(i).toLong * y(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $acc += (long) $a[$i] * (long) $b[$i];
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for graft's native vector expressions. No function-
  * registry registration is required for these (the Column wraps the
  * expression directly via [[ColumnBridge]]); SQL-text access to the same
  * expressions is registered by [[graft.GraftExtensions]].
  */
object VectorFunctions {

  /** int8-quantize a float-vector column to a binary — see [[QuantizeI8]]. */
  def vecQuantizeI8(v: Column): Column =
    ColumnBridge.column(QuantizeI8(ColumnBridge.expression(v)))

  /** Exact long dot of two quantized binaries — see [[VecDotI8]]. */
  def vecDotI8(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotI8(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `vec_dot(a, b)`: double dot product of two float/double array
    * columns — see [[VecDot]] for the exact null/length semantics.
    */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** All L×H LSH sign-bit bucket keys of a float-vector column in one
    * fused pass — see [[LshBucketKeys]].
    */
  def lshBucketKeys(v: Column, weights: Seq[Double],
      tables: Int, bitsPerTable: Int, dim: Int): Column =
    ColumnBridge.column(
      LshBucketKeys(ColumnBridge.expression(v), weights, tables, bitsPerTable, dim))

  /** IVF centroid (score, -id) struct array in one fused pass — see
    * [[IvfScores]].
    */
  def ivfScores(v: Column, centroids: Seq[(Long, Seq[Double])], norms: Seq[Double]): Column =
    ColumnBridge.column(IvfScores(ColumnBridge.expression(v), centroids, norms))
}
