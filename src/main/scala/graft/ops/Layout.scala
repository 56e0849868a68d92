package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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

  /** Compact a parquet directory's small files into ~`targetBytes`
    * outputs, restoring the range-sorted layout on `keyCol` — the
    * maintenance pass every lakehouse runs after streaming/append
    * workloads fragment a table (a 100 TB table of 1 MB files spends
    * its scan time on file-open overhead and loses footer-stat
    * selectivity; OPTIMIZE/compaction is the standard fix).
    *
    * File count = ceil(on-disk bytes / targetBytes) — sized from the
    * COMPRESSED footprint the files actually occupy (listing metadata
    * only, no data read), so output files land near `targetBytes`
    * regardless of how compressible the data is. One range shuffle +
    * per-task sort, same cost as [[writeRangeSorted]]. Writes to
    * `outPath` then returns the file count — compact-then-swap is the
    * caller's atomic-publish step ([[graft.ingest.FileIngest]]'s
    * rename discipline), never an in-place rewrite.
    */
  def compactRangeSorted(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      keyCol: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0)
    val hpath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(hpath).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val numFiles = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
    writeRangeSorted(spark.read.parquet(inPath), outPath, keyCol, numFiles)
    numFiles
  }

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

  // -------------------------------------------------------------------
  // Z-order (Morton) layout — MULTI-column locality. Range-sorting one
  // key gives that key tight per-file ranges and every OTHER key the
  // full span; interleaving the bits of two keys and range-sorting the
  // interleave bounds BOTH dimensions per file, so footer min/max stats
  // prune scans filtered on either key (or both). The standard
  // lakehouse technique for two-dimensional predicates at 100 TB.
  // -------------------------------------------------------------------

  private val SpreadMasks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 32 bits of `x` to the even bit positions of a long
    * (classic magic-mask Morton step, 5 shift-and-mask rounds — pure
    * codegen'd integer ops, no UDF).
    */
  private def spread32(x: Column): Column =
    SpreadMasks.foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** Morton (Z-order) interleave of two nonnegative 32-bit keys: bit i
    * of `a` lands at position 2i, bit i of `b` at 2i+1. Monotone in the
    * interleaved locality sense — sorting by it alternates subdivisions
    * of both dimensions.
    */
  def mortonValue(a: Column, b: Column): Column =
    spread32(a).bitwiseOR(shiftleft(spread32(b), 1))

  /** The same spread as DuckDB SQL (decimal mask literals). */
  private def spread32Sql(x: String): String =
    SpreadMasks.foldLeft(s"(($x) & ${0xFFFFFFFFL})") { case (acc, (s, m)) =>
      s"(($acc | ($acc << $s)) & $m)"
    }

  /** [[mortonValue]] as DuckDB SQL over two expression strings. */
  def mortonValueSql(a: String, b: String): String =
    s"(${spread32Sql(a)} | (${spread32Sql(b)} << 1))"

  /** Write `df` as `numFiles` parquet files with disjoint ranges of the
    * (colA, colB) Morton interleave, rows sorted by it inside each file
    * — both columns get bounded per-file min/max footer stats. Same
    * one-shuffle shape as [[writeRangeSorted]] plus one scalar min/max
    * aggregate: raw keys of different magnitudes would waste interleave
    * positions (a key whose high bits never vary contributes dead bits,
    * and the curve degenerates to a single-key sort — observed on
    * lineitem, where orderkey spans 3 more bits than partkey), so both
    * keys are range-normalized to 16 bits first, the same bounds pass
    * a lakehouse OPTIMIZE ZORDER runs. The z column never hits disk.
    *
    * Key domain: nonnegative, < ~1.4e14 (the 65535 multiplier must not
    * overflow a long).
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      numFiles: Int): Unit = {
    val bounds = df.agg(
      min(col(colA)).as("__zla"), max(col(colA)).as("__zha"),
      min(col(colB)).as("__zlb"), max(col(colB)).as("__zhb"))
    df.crossJoin(broadcast(bounds)) // 1-row frame: the scalar pattern
      .withColumn("__za", when(col("__zha") === col("__zla"), lit(0L))
        .otherwise(expr(s"((`$colA` - __zla) * 65535) div (__zha - __zla)")))
      .withColumn("__zb", when(col("__zhb") === col("__zlb"), lit(0L))
        .otherwise(expr(s"((`$colB` - __zlb) * 65535) div (__zhb - __zlb)")))
      .withColumn("__z", mortonValue(col("__za"), col("__zb")))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__za", "__zb", "__zla", "__zha", "__zlb", "__zhb")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** q104: the Z-curve locality profile over lineitem — per z-bucket
    * (top bits of the range-normalized morton(l_orderkey, l_partkey),
    * the same normalization [[writeZOrdered]] applies) row count and
    * BOTH keys' min/max, demonstrating that one sort dimension bounds
    * two predicate dimensions. One scalar bounds aggregate broadcast +
    * one map + one keyed aggregate; the bucket key spreads uniformly by
    * construction (no hot keys).
    */
  def zOrderProfile(lineitem: DataFrame, bucketShift: Int = 26): DataFrame = {
    val bounds = lineitem.agg(
      min(col("l_orderkey")).as("a0"), max(col("l_orderkey")).as("a1"),
      min(col("l_partkey")).as("b0"), max(col("l_partkey")).as("b1"))
    lineitem.crossJoin(broadcast(bounds)) // 1-row frame: the scalar pattern
      .select(col("l_orderkey"), col("l_partkey"),
        mortonValue(
          when(col("a1") === col("a0"), lit(0L))
            .otherwise(expr("((l_orderkey - a0) * 65535) div (a1 - a0)")),
          when(col("b1") === col("b0"), lit(0L))
            .otherwise(expr("((l_partkey - b0) * 65535) div (b1 - b0)"))).as("z"))
      .select(col("l_orderkey"), col("l_partkey"),
        shiftrightunsigned(col("z"), bucketShift).as("bucket"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col("l_orderkey")).as("min_ord"),
        max(col("l_orderkey")).as("max_ord"),
        min(col("l_partkey")).as("min_part"),
        max(col("l_partkey")).as("max_part"))
      .orderBy("bucket")
  }

  /** DuckDB oracle for [[zOrderProfile]]. */
  def zOrderProfileOracleSql(bucketShift: Int = 26): String = {
    val na = "CASE WHEN b.a1 = b.a0 THEN 0 " +
      "ELSE ((l_orderkey - b.a0) * 65535) // (b.a1 - b.a0) END"
    val nb = "CASE WHEN b.b1 = b.b0 THEN 0 " +
      "ELSE ((l_partkey - b.b0) * 65535) // (b.b1 - b.b0) END"
    s"""WITH b AS (
       |  SELECT min(l_orderkey) AS a0, max(l_orderkey) AS a1,
       |    min(l_partkey) AS b0, max(l_partkey) AS b1
       |  FROM lineitem),
       |z AS (
       |  SELECT l_orderkey, l_partkey,
       |    ${mortonValueSql(na, nb)} >> $bucketShift AS bucket
       |  FROM lineitem, b)
       |SELECT bucket, count(*) AS cnt,
       |  min(l_orderkey) AS min_ord, max(l_orderkey) AS max_ord,
       |  min(l_partkey) AS min_part, max(l_partkey) AS max_part
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
