package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Grouped loan metrics + the email-report top-k summary — the reference's
  * `_build_aggregates` and `get_latest_aggregates_summary`
  * (/root/reference/airflow/include/loan_spark_etl.py:91-131, 192-220).
  */
object Aggregates {

  /** (status, product_type, branch) → (loan_count, total_amount), ordered by
    * the group keys; global single-row fallback when no group column exists
    * (loan_spark_etl.py:115-120). `amount` is defensively cast to double
    * (`amount_num`, loan_spark_etl.py:105-108) — schema inference may have
    * produced strings.
    *
    * Physical shape: partial + final hash aggregate around one exchange on
    * the (low-cardinality) group keys; at scale AQE coalesces the tiny
    * post-shuffle partitions.
    */
  def build(df: DataFrame): DataFrame = {
    val withAmount =
      if (df.columns.contains("amount"))
        // try_cast: the reference's pre-ANSI cast nulls malformed strings
        // (e.g. "N/A"), Spark 4 ANSI would throw
        df.withColumn("amount_num", expr("TRY_CAST(amount AS DOUBLE)"))
      else df.withColumn("amount_num", lit(null).cast("double"))

    val groupCols = LoanSchema.groupColumns.filter(withAmount.columns.contains)

    if (groupCols.isEmpty)
      withAmount.agg(
        count(lit(1)).as("loan_count"),
        sum("amount_num").as("total_amount"))
    else
      withAmount
        .groupBy(groupCols.map(col): _*)
        .agg(
          count(lit(1)).as("loan_count"),
          sum("amount_num").as("total_amount"))
        .orderBy(groupCols.map(col): _*)
  }

  /** Email-friendly top-k summary of a written aggregates directory
    * (loan_spark_etl.py:192-220): order by loan_count desc when present,
    * take `limit` rows to the driver as key→value maps. Any read failure →
    * empty list, as in the reference (loan_spark_etl.py:216-218).
    */
  def latestSummary(spark: SparkSession, aggregatesDir: String,
      limit: Int = 10): Seq[Map[String, Any]] =
    try summaryOf(spark.read.parquet(aggregatesDir), limit)
    catch {
      // NonFatal, not Throwable: the reference catches Exception
      // (loan_spark_etl.py:216-218); swallowing OOM/interrupts is worse.
      case scala.util.control.NonFatal(_) => Seq.empty
    }

  /** The same top-k summary over an aggregate FRAME already in hand —
    * no read-back, no defensive swallow: a failure here is the caller's
    * to see. Used by the incremental streaming sink, whose per-trigger
    * state frame IS the latest aggregate table.
    */
  def summaryOf(aggregates: DataFrame, limit: Int = 10): Seq[Map[String, Any]] = {
    val df =
      if (aggregates.columns.contains("loan_count"))
        aggregates.orderBy(col("loan_count").desc)
      else aggregates
    df.limit(limit).collect().toIndexedSeq.map { (r: Row) =>
      r.schema.fieldNames.zipWithIndex
        .map { case (n, i) => n -> r.get(i) }
        .toMap
    }
  }
}
