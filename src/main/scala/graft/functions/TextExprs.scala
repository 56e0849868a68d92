package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native min-rolling-polynomial fingerprint of a text column
  * ([[graft.ops.TextOps.fingerprints]] / q33).
  *
  * Replaces the two-stage higher-order pipeline
  * `transform(split(text,''), ascii)` → `array_min(transform(sequence(...),
  * window-sum))`, which runs interpreted (CodegenFallback lambdas) and
  * pays ~k try_element_at dispatches per window plus one lambda dispatch
  * per character. This expression is one pass: codepoints once, then a
  * primitive window loop.
  *
  * BIT-IDENTICAL to the HOF form by construction — the fingerprint is
  * exact integer arithmetic mod `p` (every term < 2^52, window sum
  * < 2^55, no floating point), so loop structure cannot change the
  * value. Matching edge semantics:
  *   - codepoint list = `split(text, '')` + `ascii`: full Unicode
  *     codepoints (surrogate pairs intact); empty text yields the single
  *     code 0 (split('') on '' is [''] and ascii('') = 0);
  *   - windows start at 1..max(len-k+1, 1); positions past the end
  *     contribute code 0 (the coalesce(try_element_at, 0) padding);
  *   - null text -> null.
  */
case class RollingMinFingerprint(child: Expression, k: Int, b: Long, p: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RollingMinFingerprint.compute(input.asInstanceOf[UTF8String].toString, k, b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingMinFingerprint.compute($c.toString(), $k, ${b}L, ${p}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingMinFingerprint {

  /** min over windows i of (sum_j code(i+j) * b^(k-1-j)) mod p — called
    * from both the interpreted eval and the generated code.
    */
  def compute(s: String, k: Int, b: Long, p: Long): Long = {
    val cps: Array[Int] =
      if (s.isEmpty) Array(0) else s.codePoints().toArray
    val n = cps.length
    val pows = new Array[Long](k)
    pows(k - 1) = 1L
    var j = k - 2
    while (j >= 0) { pows(j) = pows(j + 1) * b % p; j -= 1 }
    val nWindows = math.max(n - k + 1, 1)
    var mn = Long.MaxValue
    var i = 0
    while (i < nWindows) {
      var sum = 0L
      var t = 0
      while (t < k) {
        if (i + t < n) sum += cps(i + t).toLong * pows(t)
        t += 1
      }
      val h = sum % p
      if (h < mn) mn = h
      i += 1
    }
    mn
  }
}

/** Column-API surface for graft's native text expressions (registry-free,
  * same bridge as [[VectorFunctions]]; SQL names via
  * [[graft.GraftExtensions]]).
  */
object TextFunctions {

  def rollingFingerprint(text: Column, k: Int, b: Long, p: Long): Column =
    ColumnBridge.column(RollingMinFingerprint(ColumnBridge.expression(text), k, b, p))
}
