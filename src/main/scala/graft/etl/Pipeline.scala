package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.storage.StorageLevel

/** The end-to-end loan ETL — the reference's `run_loan_spark_etl`
  * (/root/reference/airflow/include/loan_spark_etl.py:134-189):
  *
  *   read CSV glob → empty guard → mode-impute nulls → date split →
  *   write cleaned parquet + write grouped aggregates parquet.
  *
  * Scale-relevant departures from the reference (results identical):
  *   - the cleaned frame is persisted between the two writes — the reference
  *     recomputes the whole lineage for the aggregate write
  *     (SURVEY.md §4 "Caching / reuse");
  *   - imputation is the single-pass variant (one job, not one per column);
  *   - `coalesce(1)` stays behind the same flag as the reference
  *     (loan_spark_etl.py:139) and should be OFF at scale — a single output
  *     file means a single writing task.
  */
object Pipeline {

  final case class Result(cleanedPath: String, aggregatesPath: String,
      rowCount: Long)

  def run(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      cleanedSubdir: String = "cleaned",
      aggregatesSubdir: String = "aggregates",
      coalesceOutput: Boolean = true,
      faithfulImpute: Boolean = false,
      // The reference ETL reads every CSV in the dir (loan_spark_etl.py:155)
      // because the DAG's admission filter (loan_ prefix) runs upstream —
      // see graft.ingest.FileIngest. Tighten here when running without the
      // ingest stage, e.g. "loan_*.csv".
      globPattern: String = "*.csv"): Option[Result] = {

    val df = spark.read
      .option("header", true)
      .option("inferSchema", true)
      .csv(s"$inputDir/$globPattern")

    if (df.isEmpty) return None

    val imputed = if (faithfulImpute) Impute.faithful(df) else Impute(df)
    val cleaned = Dates.transform(imputed).persist(StorageLevel.MEMORY_AND_DISK)

    try {
      val aggDf = Aggregates.build(cleaned)

      val cleanedPath = s"$outputDir/$cleanedSubdir"
      val aggregatesPath = s"$outputDir/$aggregatesSubdir"

      val cleanedOut = if (coalesceOutput) cleaned.coalesce(1) else cleaned
      cleanedOut.write.mode(SaveMode.Overwrite).parquet(cleanedPath)

      val aggOut = if (coalesceOutput) aggDf.coalesce(1) else aggDf
      aggOut.write.mode(SaveMode.Overwrite).parquet(aggregatesPath)

      Some(Result(cleanedPath, aggregatesPath, cleaned.count()))
    } finally cleaned.unpersist()
  }
}
