package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge for graft's native expressions.
  *
  * Spark 4 removed the public `Column(expr)` constructor (Column is now a
  * connect-neutral ColumnNode wrapper in sql-api); the classic-session
  * conversion lives in `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]`. This one-object shim re-exports exactly the
  * two conversions graft needs, so [[graft.functions.VectorFunctions]]
  * can build typed Columns from custom expressions without requiring
  * callers to register anything in a function registry first. SQL-text
  * users get the same expressions via [[graft.GraftExtensions]]
  * (`spark.sql.extensions`) instead.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
