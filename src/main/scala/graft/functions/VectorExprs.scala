package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

/** Column-API surface for graft's native vector expressions. No function-
  * registry registration is required for these (the Column wraps the
  * expression directly via [[ColumnBridge]]); SQL-text access to the same
  * expressions is registered by [[graft.GraftExtensions]].
  */
object VectorFunctions {

  /** `vec_dot(a, b)`: double dot product of two float/double array
    * columns — see [[VecDot]] for the exact null/length semantics.
    */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
