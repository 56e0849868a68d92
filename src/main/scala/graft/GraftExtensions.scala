package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VecDot

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
  }
}
