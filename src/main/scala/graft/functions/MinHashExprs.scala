package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native one-pass MinHash signature of a token-array column: K per-doc
  * minima of the universal hash family h_i(x) = (a_i·x + b_i) mod p over
  * the 28-bit md5 token hashes — [[graft.ops.NearDup]]'s construction,
  * computed entirely map-side.
  *
  * This replaces the explode → 64-column min-aggregate pipeline: the
  * aggregate was codegen'd and map-side-partialed, but it still exploded
  * every (doc, token) into a shuffled row with 64 accumulator columns.
  * As an expression, the signature stage becomes a PURE MAP — no
  * generator, no exchange; at cluster scale the corpus never moves for
  * signatures (the same shape [[AnnLsh.bucketArray]] already had).
  *
  * BIT-IDENTICAL to the aggregate form (exact integer arithmetic:
  * x < 2^28, a_i ≤ 2^28, so a_i·x + b_i < 2^57 — no overflow, and min
  * is order-free):
  *   - token hash = first 7 hex digits of md5(utf8 bytes) (28 bits);
  *   - null tokens are ignored (the min aggregate skipped their null
  *     hashes); an array with no non-null tokens yields a NULL
  *     signature (the aggregate yielded all-null minima — callers
  *     filter either shape out, see [[graft.ops.NearDup.signatures]]);
  *   - null array -> null.
  */
case class MinHashSig(child: Expression, seedsA: Seq[Long], seedsB: Seq[Long], p: Long)
    extends UnaryExpression {

  require(seedsA.length == seedsB.length && seedsA.nonEmpty,
    "seedsA and seedsB must be equal-length and non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val aArr: Array[Long] = seedsA.toArray
  @transient private lazy val bArr: Array[Long] = seedsB.toArray

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    val resultTerm = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object $resultTerm = graft.functions.MinHashSig.compute($c, $aRef, $bRef, ${p}L);
         |if ($resultTerm == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $resultTerm;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  /** One pass over the tokens updating all K minima; null when no
    * non-null token exists (see class doc). Called from interpreted eval
    * and generated code.
    */
  def compute(toks: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = toks.numElements()
    var any = false
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        any = true
        md.reset()
        val d = md.digest(toks.getUTF8String(i).getBytes)
        // first 7 hex digits = 28 bits: 3 bytes + the high nibble of the 4th
        val x = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
          ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >> 4)
        var j = 0
        while (j < k) {
          val h = (a(j) * x + b(j)) % p
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }
}

/** Column-API surface (registry-free, same bridge as [[VectorFunctions]]). */
object MinHashFunctions {

  def minhashSig(toks: Column, seeds: Seq[(Long, Long)], p: Long): Column =
    ColumnBridge.column(
      MinHashSig(ColumnBridge.expression(toks), seeds.map(_._1), seeds.map(_._2), p))
}
