package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's OWN Bloom-filter Catalyst expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the pair the
  * optimizer's runtime-filter injection uses internally but does not
  * expose in the public function registry).
  *
  * graft uses them as an explicit set-membership sketch: build the
  * sketch with ONE aggregation over the small side (partial + merge —
  * a distributed fold, never a driver-side loop over rows), collect the
  * KB-scale serialized filter, and probe map-side via a foldable binary
  * literal. `might_contain` is fully codegen'd (the filter deserializes
  * once per task, not per row), so a probe over 100 TB of rows is a
  * narrow whole-stage-codegen pass with zero shuffle.
  *
  * Both sides hash through `xxhash64` (LongType), the same construction
  * Spark's own injected runtime filters use.
  */
object SketchFunctions {

  /** Aggregate: Bloom filter over `hashed` (must be LongType, e.g.
    * `xxhash64(col)`), sized for `estimatedItems` distinct values at the
    * expression's default false-positive rate (3%). Returns the
    * serialized filter as one binary value.
    *
    * Sizing cap: Spark silently clamps the item/bit counts to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `.maxNumBits` (defaults 4M items / 2^26 bits). Past ~4M distinct
    * values the sketch is undersized and the false-positive rate
    * degrades beyond 3% — answers stay exact wherever a verify join
    * follows (the [[graft.ops.TrainPipe.decontaminateBloom]] pattern),
    * but the positive sliver grows; raise those confs when the build
    * side is that large.
    */
  def bloomFilterAgg(hashed: Column, estimatedItems: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(hashed), estimatedItems)
        .toAggregateExpression())

  /** Predicate: might `hashed` (LongType, same hash as the build side)
    * be in the serialized `sketch`? False ⇒ definitively absent (no
    * false negatives); true ⇒ verify exactly downstream.
    */
  def mightContain(sketch: Array[Byte], hashed: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        Literal(sketch, BinaryType),
        ColumnBridge.expression(hashed)))
}
