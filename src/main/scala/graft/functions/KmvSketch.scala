package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** K-minimum-values (KMV) distinct-count sketch as a native Catalyst
  * aggregate: one pass over a pre-hashed long column, O(k) state per
  * partial, standard partial+merge distribution — the deterministic,
  * oracle-checkable counterpart to q42's HLL++ `approx_count_distinct`.
  *
  * Public-knowledge construction: Bar-Yossef, Jayram, Kumar,
  * Sivakumar, Trevisan (RANDOM '02, "Counting distinct elements in a
  * data stream") and the multi-set refinement in Beyer, Haas, Reinwald,
  * Sismanis, Gemulla (SIGMOD '07, "On synopses for distinct-value
  * estimation under multiset operations"): keep the k smallest DISTINCT
  * hash values; with U(k) the k-th smallest hash mapped into [0, 1),
  * the (unbiased basic) estimator is (k-1) / U(k), with relative error
  * ~ 1/sqrt(k-2). The summary is fully mergeable — union two sketches
  * and re-truncate to the k smallest — so ANY merge tree Spark picks
  * (map-side partials, shuffled merge) yields the identical final
  * sketch: the k smallest distinct hashes of the whole input, no matter
  * the partitioning or row order. That set-algebraic determinism is
  * what makes the estimate bit-reproducible and therefore DuckDB
  * oracle-checkable (unlike HLL++, whose register layout and bias
  * tables are engine-private).
  *
  * The hash is deliberately OUTSIDE the aggregate (caller supplies any
  * nonnegative long hash column): the exact same integer arithmetic is
  * then expressible on the oracle side, and the sketch composes with
  * whatever keying the pipeline already has.
  *
  * Why TypedImperativeAggregate (not an Expression): the state is a
  * bounded ordered set that must ride Spark's partial-aggregation
  * machinery — map-side partials, serialized shuffle, merge on the
  * reducer — exactly like [[MisraGriesAgg]] and Spark's own sketches.
  * At 100 TB the raw keys never shuffle: each map task emits at most
  * k longs per group.
  */
case class KmvMinHashesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k > 1, "k must be at least 2 (the estimator divides by k-1)")

  override def prettyName: String = "kmv_min_hashes"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long (pre-hashed) column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf // nulls count nothing, like count(col)
    val h = v.asInstanceOf[Long]
    // admit only if it would land inside the current k minimum —
    // TreeSet dedups, so duplicates of an admitted hash are free
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.pollLast(); () }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    // union, then re-truncate to the k smallest — the Beyer et al. merge
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k) { buf.add(h); () }
      else if (h < buf.last()) {
        if (buf.add(h)) { buf.pollLast(); () }
      } else {
        // `other` iterates ascending: everything after this is larger still
        return buf
      }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out): ArrayData // ascending — TreeSet iteration order
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinHashesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinHashesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinHashesAgg =
    copy(child = newChild)
}

/** Column-API surface for the KMV sketch plus the shared hash/estimator
  * arithmetic (kept in exact integers so Spark and the DuckDB oracle
  * compute bit-identical estimates).
  */
object KmvSketch {

  /** Hash-space modulus: a prime ~1e9, so every intermediate product in
    * the two affine rounds stays far under Long overflow for inputs up
    * to ~9e9 (A1 * x < 1e9 * 9e9 ≈ 9e18 is the binding constraint).
    */
  val P: Long = 1000000007L
  /** Two affine rounds mod P (each a permutation of Z_P; composing two
    * breaks the monotone structure a single round leaves on sequential
    * keys). Constants are arbitrary odd values < P.
    */
  val A1: Long = 387420489L
  val B1: Long = 876543211L
  val A2: Long = 298765431L
  val B2: Long = 123456791L

  /** The shared hash: x (any nonnegative long) → [0, P). The input is
    * pre-reduced mod P before the affine rounds, so every intermediate
    * product is < P·A ≈ 4e17 — no Long overflow for ANY nonnegative
    * input (the un-reduced form silently wrapped on Spark above ~2.4e10
    * while DuckDB raised a BIGINT overflow error: the two engines
    * failed differently past the old ~9e9 advisory limit). Identical
    * values for inputs already < P (x % P = x), so every existing data
    * path — polyHash outputs, test-scale ids — is bit-unchanged.
    */
  def hash(x: Column): Column = {
    import org.apache.spark.sql.functions.lit
    (((x % lit(P)) * lit(A1) + lit(B1)) % lit(P) * lit(A2) + lit(B2)) % lit(P)
  }

  /** The same hash as DuckDB SQL over an expression string. */
  def hashSql(x: String): String =
    s"(((($x) % $P) * $A1 + $B1) % $P * $A2 + $B2) % $P"

  /** Aggregate: the k smallest distinct values of `hashed` (ascending
    * `array<long>`, length = min(k, distinct hashes seen)).
    */
  def kmvMinHashes(hashed: Column, k: Int): Column =
    ColumnBridge.column(
      KmvMinHashesAgg(ColumnBridge.expression(hashed), k).toAggregateExpression())

  /** Distinct-count estimate from the sketch array: exact size when the
    * set never filled (fewer than k distinct values — the sketch IS the
    * distinct set), else the Bar-Yossef/Beyer basic estimator
    * (k-1)·P div U(k), in INTEGER division (`div`, not `/`) so Spark and
    * DuckDB (`//`) agree bit-for-bit — a double-rounded quotient could
    * truncate differently at integer boundaries.
    *
    * `minHashes` is a column NAME (the expression string needs it: the
    * Scala Column API exposes no integer-div combinator).
    */
  def kmvEstimate(minHashes: String, k: Int): Column = {
    import org.apache.spark.sql.functions.{col, expr, size, when}
    when(size(col(minHashes)) < k, size(col(minHashes)).cast("long"))
      .otherwise(expr(s"${(k - 1).toLong * P}L div element_at($minHashes, $k)"))
  }

  /** The same estimator as DuckDB SQL (list is ascending, 1-based). */
  def kmvEstimateSql(minHashes: String, k: Int): String =
    s"CASE WHEN len($minHashes) < $k THEN CAST(len($minHashes) AS BIGINT) " +
      s"ELSE ${(k - 1).toLong * P} // $minHashes[$k] END"

  /** Polynomial base for the string→long fold below. */
  val PolyB: Long = 131L

  /** String → [0, P) via a left fold (acc·B + codepoint) mod P — the
    * q33 fingerprint arithmetic minus the windowing, computable with
    * exact integers in BOTH engines (codegen'd higher-order `aggregate`
    * here, `list_reduce` in DuckDB — identical because the fold's first
    * step 0·B + c₀ = c₀ matches reduce's first-element seeding). Null in,
    * null out; empty string → 0 on both sides. Feed the result through
    * [[hash]] before sketching: the poly fold is uniform enough for
    * equality but the affine rounds break its low-entropy structure.
    *
    * Input contract: BMP text only. Spark's `split(s, "")` yields UTF-16
    * code units, so a non-BMP (astral-plane) character becomes TWO lone
    * surrogates (two fold steps) where DuckDB's `string_split(s, '')`
    * yields ONE codepoint — the hashes diverge. Every current caller
    * feeds ASCII-domain columns (langs, sources, whitespace tokens of
    * the synthetic corpus); folding over codepoints via a native
    * expression is the upgrade path if astral text ever needs sketching.
    */
  def polyHash(s: Column): Column = {
    import org.apache.spark.sql.functions.{aggregate, ascii, filter, length, lit, split}
    // filter: Java-split semantics can emit empty-string elements (e.g. a
    // trailing "" under limit -1) that DuckDB's char split never produces
    aggregate(filter(split(s, ""), ch => length(ch) > 0), lit(0L),
      (acc, ch) => (acc * lit(PolyB) + ascii(ch).cast("long")) % lit(P))
  }

  /** The same string fold as DuckDB SQL over an expression string. */
  def polyHashSql(s: String): String =
    s"CASE WHEN $s IS NULL THEN NULL WHEN len($s) = 0 THEN 0 " +
      s"ELSE list_reduce(list_transform(string_split($s, ''), " +
      s"c -> greatest(CAST(unicode(c) AS BIGINT), 0)), " +
      s"(acc, c) -> (acc * $PolyB + c) % $P) END"
}
