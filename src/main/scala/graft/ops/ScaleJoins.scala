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

  /** Two-phase skew-salted sum/count: partial aggregate on (key, salt),
    * final on key. For ALGEBRAIC aggregates Spark's hash aggregation
    * already does map-side partials, so plain `groupBy` rarely skews —
    * this shape matters when partial aggregation degrades: sort-based
    * fallback under aggregation-buffer pressure, or a hot key whose
    * *final*-side merge still lands on one reducer with giant
    * intermediate state (collect_list-like buffers). The salt spreads
    * that key's final-stage state over `n` reducers; the second
    * aggregate merges `n` tiny rows per key. Result rows are identical
    * to the unsalted aggregate (equality spec in ScaleJoinsSpec).
    *
    * The salt is ROW-based (round-robin within each partition), not a
    * value hash: the canonical hot key has billions of rows sharing a
    * low-cardinality value (status codes, zeros), and hash(value) would
    * map them all to one salt — no spread at all. The salt value never
    * reaches the result, so the row-order dependence is harmless.
    */
  def saltedSumCount(df: DataFrame, key: String, value: String, n: Int): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(n)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(value)).as("__s"), count(col(value)).as("__c"))
      .groupBy(col(key))
      .agg(sum("__s").as(s"sum_$value"), sum("__c").as(s"cnt_$value"))

  /** Skew-safe EXACT distinct count: the case where salting a groupBy is
    * genuinely load-bearing. Exact `count_distinct` keeps every distinct
    * value of a key in ONE reducer's buffer — a hot key with millions of
    * distincts is a straight OOM. Salting by `hash(value) % n` is
    * correct for distincts (identical values always share a salt, so
    * per-salt distinct counts partition the value set and ADD): phase 1
    * counts distincts per (key, salt) with bounded buffers, phase 2 sums
    * n small counts per key.
    */
  def saltedDistinctCount(df: DataFrame, key: String, value: String, n: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(value)), lit(n)))
      .groupBy(col(key), col("__salt"))
      .agg(count_distinct(col(value)).as("__d"))
      .groupBy(col(key))
      .agg(sum("__d").as(s"distinct_$value"))
}
