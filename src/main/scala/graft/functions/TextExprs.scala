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

/** Native per-row 32-bit SimHash (Charikar '02) of a text column — the
  * streaming fingerprint ([[graft.ops.TextOps.simhashColumn]]).
  *
  * Replaces a pipeline of `transform(array_distinct(split(text, " ")),
  * md5-hash)` plus 32 separate `aggregate()` bit-vote folds — each fold
  * an interpreted re-walk of the token-hash array (32 × T lambda
  * dispatches per row). One pass here: tokens once, all 32 vote counters
  * updated per token hash.
  *
  * BIT-IDENTICAL to the HOF form and to the batch groupBy simhash:
  *   - tokens = `split(text, " ")` with Spark's limit -1 semantics
  *     (leading AND trailing empty tokens kept), first-occurrence
  *     distinct (order is irrelevant to the vote sums);
  *   - token hash = first 8 hex digits of md5(utf8 bytes) as an
  *     unsigned 32-bit value — the cross-engine [[graft.ops.NearDup]]
  *     construction;
  *   - bit j of the fingerprint set iff the +1/-1 majority vote over
  *     distinct tokens is >= 0; null text -> null.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash32"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {

  /** One-pass SimHash — called from interpreted eval and generated code. */
  def compute(s: String): Long = {
    // limit -1 matches Spark's split(): trailing empty tokens survive
    val toks = s.split(" ", -1)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](32)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        md.reset()
        val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 8 hex digits of the md5 = first 4 bytes, big-endian unsigned
        val x = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var j = 0
        while (j < 32) {
          if (((x >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) >= 0) fp |= 1L << j
      j += 1
    }
    fp
  }
}

/** Per-length vocabulary lookup for [[BpeTokenCount]] — built once per
  * expression instance on the driver, shipped inside the plan (the
  * centroid-literal pattern), shared by interpreted eval and generated
  * code. Top-level class so generated Java can name it without a `$`.
  */
final class BpeVocabTable(
    val byLen: Array[java.util.HashSet[String]],
    val maxLen: Int) extends Serializable

/** Greedy longest-match subword token count against a fixed merge
  * vocabulary — the BPE-segmentation shape (Sennrich et al. 2016)
  * reduced to counting: every whitespace-delimited word is segmented
  * left-to-right, each step consuming the LONGEST vocabulary entry
  * starting at the cursor (2..maxLen codepoints) or a single codepoint,
  * and the result is the number of pieces in the document. Deterministic
  * by construction (no merge-order state: longest-match against a fixed
  * set), so a DuckDB recursive CTE replays it exactly — which is what
  * lets token-budget operators (q79/q87) be denominated in subword
  * tokens and still hash-verify.
  *
  * All positions and lengths are UNICODE CODEPOINTS (matching DuckDB's
  * len/substr and Spark's length/substr), not UTF-16 chars — surrogate
  * pairs count once. Null text -> null; empty text -> 0; runs of spaces
  * produce no empty-word tokens.
  */
case class BpeTokenCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"

  @transient private lazy val table: BpeVocabTable =
    BpeTokenCount.buildTable(vocab)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    BpeTokenCount.compute(input.asInstanceOf[UTF8String].toString, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", table,
      "graft.functions.BpeVocabTable")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeTokenCount.compute($c.toString(), $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCount {

  def buildTable(vocab: Seq[String]): BpeVocabTable = {
    val maxLen = vocab.foldLeft(2) { (m, g) =>
      math.max(m, g.codePointCount(0, g.length))
    }
    val byLen = Array.fill(maxLen + 1)(new java.util.HashSet[String]())
    vocab.foreach(g => byLen(g.codePointCount(0, g.length)).add(g))
    new BpeVocabTable(byLen, maxLen)
  }

  /** Greedy longest-match piece count — called from interpreted eval and
    * generated code.
    */
  def compute(s: String, t: BpeVocabTable): Long = {
    var cnt = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var e = i
        while (e < n && s.charAt(e) != ' ') e += 1
        val w = s.substring(i, e)
        // codepoint offsets so lengths match DuckDB's len/substr
        val m = w.codePointCount(0, w.length)
        val offs = new Array[Int](m + 1)
        var j = 0
        var ci = 0
        while (j < m) {
          offs(j) = ci
          ci = w.offsetByCodePoints(ci, 1)
          j += 1
        }
        offs(m) = w.length
        var p = 0
        while (p < m) {
          var step = 1
          var l = math.min(t.maxLen, m - p)
          while (l >= 2 && step == 1) {
            if (t.byLen(l).contains(w.substring(offs(p), offs(p + l)))) step = l
            l -= 1
          }
          cnt += 1
          p += step
        }
        i = e
      }
    }
    cnt
  }
}

/** Column-API surface for graft's native text expressions (registry-free,
  * same bridge as [[VectorFunctions]]; SQL names via
  * [[graft.GraftExtensions]]).
  */
object TextFunctions {

  def rollingFingerprint(text: Column, k: Int, b: Long, p: Long): Column =
    ColumnBridge.column(RollingMinFingerprint(ColumnBridge.expression(text), k, b, p))

  def simhash32(text: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(text)))

  def bpeTokenCount(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(text), vocab))
}
