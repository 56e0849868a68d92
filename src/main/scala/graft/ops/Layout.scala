package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scan-time skipping: range-partitioned,
  * within-partition-sorted parquet.
  *
  * The complement of Hive-style `partitionBy` (see `PartitioningSpec`):
  * directory partitioning only works for low-cardinality columns (one
  * dir per value), while a RANGE layout handles high-cardinality keys —
  * ids, timestamps — by giving every output file a narrow, disjoint
  * key range. Parquet persists per-row-group min/max for each column,
  * so a pushed-down point or range predicate lets the scan skip whole
  * row groups (and with a file-per-range, whole files) without reading
  * them: on a 100 TB table laid out this way, a key-range query touches
  * O(matching files), not O(table).
  *
  * Scale shape: `repartitionByRange` samples the key to build balanced
  * range bounds (one pass + one shuffle, no global sort barrier beyond
  * the range exchange), and the within-partition sort is per-task.
  * This is the batch twin of the reference's named output
  * subdirectories (/root/reference/airflow/include/loan_spark_etl.py:
  * 171-183, `cleaned_subdir`/`aggregates_subdir`), which organize
  * output into separately-readable units for later selective reads.
  */
object Layout {

  /** Write `df` as `numFiles` parquet files with disjoint `keyCol`
    * ranges, rows sorted by `keyCol` inside each file (so row-group
    * min/max stats are tight).
    */
  def writeRangeSorted(
      df: DataFrame,
      path: String,
      keyCol: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Per-file (lo, hi, rows) of `keyCol` for a parquet dir — the layout
    * the footer statistics expose to scan-time pruning, surfaced as a
    * DataFrame so specs (and operators) can assert disjointness.
    */
  def fileRanges(spark: SparkSession, path: String, keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(
        min(col(keyCol)).as("lo"),
        max(col(keyCol)).as("hi"),
        count(lit(1)).as("rows"))
}
