package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Join-locality tools for the 100 TB design target (SURVEY §2.3 is the
  * logical join surface; this is the physical one):
  *
  *   - broadcast: used throughout Queries (q10 star dims) — smallest side
  *     ships to every executor, zero shuffle;
  *   - bucketing ([[writeBucketed]]): both fact tables pre-partitioned on
  *     the join key at write time, so every later equi-join on that key
  *     reads co-located buckets and skips the exchange entirely — THE
  *     pattern for repeated fact-fact joins over a stable key;
  *   - salting ([[saltedJoin]]): a hot key that would funnel one reducer
  *     is split across `n` sub-partitions; the dim side is replicated n×
  *     (tiny), the fact side never skews. AQE's skew-join split handles
  *     sort-merge skew adaptively; explicit salting is the deterministic
  *     fallback and also covers aggregations.
  */
object ScaleJoins {

  /** Write `df` as a bucketed+sorted managed table on `key`: `nBuckets`
    * files per partition, rows hash-distributed by key and sorted within
    * buckets — a later join between two tables bucketed the same way
    * plans SortMergeJoin with NO Exchange and NO per-join Sort.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables; caller asserts the plan is
    * exchange-free (see ScaleJoinsSpec).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right), col(leftKey) === col(rightKey))

  /** Skew-safe equi-join of a skewed `big` side against a small `dim`:
    * big rows get a deterministic salt from `saltSource` (any
    * well-distributed column), dim rows replicate across all `n` salts,
    * and the join key becomes (key, salt) — a hot key now spreads over
    * `n` reducers. Result rows are identical to the unsalted join.
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
      saltSource: String, n: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(col(saltSource)), lit(n)))
    val replicated = dim.withColumn(
      "__salt", explode(array((0 until n).map(i => lit(i)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
