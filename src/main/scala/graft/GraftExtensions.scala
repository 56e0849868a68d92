package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{QuantizeI8, RollingMinFingerprint, SimHash32, VecDot, VecDotI8}

/** Session extensions registering graft's native expressions in the SQL
  * function registry, so `spark.sql("... vec_dot(a, b) ...")` resolves
  * them by name. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` (wired by default in
  * [[graft.etl.Sessions.builder]]) or `.withExtensions(new
  * GraftExtensions)`.
  *
  * The Scala Column API ([[graft.functions.VectorFunctions]]) does NOT
  * depend on this registration — it wraps the expressions directly — so
  * the operator library stays usable on sessions built without the
  * extension.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => VecDot(a, b)
        case other => throw new IllegalArgumentException(
          s"vec_dot requires exactly 2 arguments, got ${other.length}")
      }))
    // single-arg SQL form with the catalog's fingerprint constants
    // (graft.ops.TextOps.Fingerprint{K,B,P})
    ext.injectFunction((
      FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingMinFingerprint].getName, "rolling_fingerprint"),
      (children: Seq[Expression]) => children match {
        case Seq(text) => RollingMinFingerprint(text,
          graft.ops.TextOps.FingerprintK,
          graft.ops.TextOps.FingerprintB,
          graft.ops.TextOps.FingerprintP)
        case other => throw new IllegalArgumentException(
          s"rolling_fingerprint requires exactly 1 argument, got ${other.length}")
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (children: Seq[Expression]) => children match {
        case Seq(text) => SimHash32(text)
        case other => throw new IllegalArgumentException(
          s"simhash32 requires exactly 1 argument, got ${other.length}")
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_quantize_i8"),
      new ExpressionInfo(classOf[QuantizeI8].getName, "vec_quantize_i8"),
      (children: Seq[Expression]) => children match {
        case Seq(v) => QuantizeI8(v)
        case other => throw new IllegalArgumentException(
          s"vec_quantize_i8 requires exactly 1 argument, got ${other.length}")
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot_i8"),
      new ExpressionInfo(classOf[VecDotI8].getName, "vec_dot_i8"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => VecDotI8(a, b)
        case other => throw new IllegalArgumentException(
          s"vec_dot_i8 requires exactly 2 arguments, got ${other.length}")
      }))
    // Rule[LogicalPlan] leg: rewrite the interpreted aggregate(zip_with)
    // dot-product idiom into the native VecDot (result-preserving by
    // construction — see graft.plans.DotProductRewrite)
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
  }
}
