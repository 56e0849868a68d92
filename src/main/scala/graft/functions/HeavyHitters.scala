package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst aggregate: one
  * pass over a string column, O(capacity) state per partial, standard
  * partial+merge distribution — the candidate-generation half of the
  * at-scale exact top-k path (q83).
  *
  * Public-knowledge construction: Misra & Gries '82 ("Finding repeated
  * elements"); the merge step and its error bound are the mergeable-
  * summaries result (Agarwal, Cormode, Huang, Phillips, Wei, Yi, PODS
  * '12): merging two summaries with error ε·N₁ and ε·N₂ yields error
  * ≤ ε·(N₁+N₂) for ε = 1/(capacity+1), so ANY merge tree — i.e. any
  * partitioning Spark picks — keeps the global bound
  *
  *   true_count − stored_count ≤ N / (capacity + 1).
  *
  * Consequence: every term with true frequency > N/(capacity+1) SURVIVES
  * regardless of row order or partitioning. Downstream, an exact recount
  * of just the survivors (a filter + tiny aggregate) turns the sketch
  * into a provably exact top-k whenever the k-th true frequency clears
  * that threshold — which is what makes q83 oracle-checkable against the
  * same SQL as the full exact top-k.
  *
  * Why TypedImperativeAggregate (not an Expression): the state is a
  * bounded map that must ride Spark's partial-aggregation machinery —
  * map-side partials, serialized shuffle, merge on the reducer — exactly
  * like Spark's own `BloomFilterAggregate`/HLL++ sketches.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

  require(capacity > 0, "capacity must be positive")

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf // nulls count nothing, like count(col)
    val term = v.asInstanceOf[UTF8String]
    buf.get(term) match {
      case Some(c) => buf.update(term, c + 1)
      case None if buf.size < capacity =>
        // clone: the incoming UTF8String may point into a reused row buffer
        buf.update(term.clone(), 1L)
      case None =>
        // full and unseen: decrement every counter (the new item's
        // implicit counter hits 0 too), evict zeros — classic MG step
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (t, c) => buf.update(t, buf.getOrElse(t, 0L) + c) }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // evict non-positives — the PODS'12 mergeable-summaries step
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - capacity - 1)
      buf.mapValuesInPlace((_, c) => c - d)
      buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic output order: estimate desc, term asc
    val entries = buf.toArray.sortBy { case (t, c) => (-c, t) }
    val out = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      out(i) = new GenericInternalRow(Array[Any](entries(i)._1, entries(i)._2))
      i += 1
    }
    new GenericArrayData(out): ArrayData
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

/** Column-API surface for the heavy-hitters sketch. */
object HeavyHitters {

  /** One-pass Misra–Gries summary of `term`: `array<struct<term, est>>`
    * where every term with true frequency > N/(capacity+1) is guaranteed
    * present and `est` undercounts by at most N/(capacity+1) — see
    * [[MisraGriesAgg]].
    */
  def misraGries(term: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(term), capacity).toAggregateExpression())
}
