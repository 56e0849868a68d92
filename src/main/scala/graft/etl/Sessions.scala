package graft.etl

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the reference's semantic configs
  * (/root/reference/airflow/include/loan_spark_etl.py:27-45): UTC session
  * timezone, CORRECTED parquet datetime rebase, LEGACY lenient time parser.
  *
  * On top, scale-oriented defaults the reference leaves untuned: AQE on and
  * shuffle partitions sized to the machine instead of Spark's default 200
  * (SURVEY.md §4 "Shuffle partitioning").
  */
object Sessions {

  def builder(appName: String = "LoanSparkETL", master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors)
      : SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
      .config("spark.sql.legacy.timeParserPolicy", "LEGACY")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(appName: String = "LoanSparkETL"): SparkSession =
    builder(appName).getOrCreate()
}
