package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, ZipWith, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

import graft.functions.VecDot

/** Optimizer rule: rewrite the higher-order dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> cast(x) * cast(y)), 0.0d, (acc, v) -> acc + v) }}}
  *
  * into the native [[graft.functions.VecDot]] expression. The idiom is
  * how a user writes a dot product in plain Spark SQL (it was graft's
  * own form through round 10), but `ArrayZipWith`/`ArrayAggregate`
  * evaluate interpreted, per-element boxed, with an intermediate product
  * array; VecDot is one codegen'd primitive loop with BIT-IDENTICAL
  * semantics (same left-to-right IEEE double fold; NULL on null array,
  * null element, or length mismatch — zip_with's null-padding makes the
  * folded sum NULL in exactly those cases; empty arrays give 0.0). The
  * rewrite is therefore result-preserving by construction, and
  * `VectorExprsSpec` pins the equivalence.
  *
  * Matched conservatively: zero must be literal 0.0 double, the merge
  * lambda exactly `acc + v` in that order, the zip lambda exactly
  * `x * y` (each side the lambda's own variable, bare or double-cast),
  * the finish lambda the identity, and both arrays float/double typed.
  * Anything else is left untouched.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule` —
  * the `Rule[LogicalPlan]` leg of the extension surface next to the
  * injected functions.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isVectorType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }

  /** The lambda operand is the lambda's own variable, bare (already
    * double) or widened through a double cast.
    */
  private def isDoubleOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case c: Cast => c.dataType == DoubleType && c.child.semanticEquals(v)
    case other   => other.dataType == DoubleType && other.semanticEquals(v)
  }

  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(body, Seq(arg: NamedLambdaVariable), _) => body.semanticEquals(arg)
    case _                                                      => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(left, right,
            LambdaFunction(mul: Multiply,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add: Add,
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish)
        if isDoubleOf(mul.left, x) && isDoubleOf(mul.right, y) &&
          add.left.semanticEquals(acc) && add.right.semanticEquals(v) &&
          isIdentity(finish) &&
          isVectorType(left.dataType) && isVectorType(right.dataType) =>
      VecDot(left, right)
  }
}
