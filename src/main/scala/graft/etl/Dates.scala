package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `created_at` → (`created_date` DATE, `created_time` "HH:mm:ss") split —
  * the reference's `_transform_dates`
  * (/root/reference/airflow/include/loan_spark_etl.py:71-88).
  *
  * Lenient parsing comes from the session's LEGACY time-parser policy
  * (loan_spark_etl.py:42, set in [[Sessions]]); unparseable values yield
  * nulls in both derived columns — `try_to_timestamp` because the reference
  * ran pre-ANSI Spark 3.5 where plain to_timestamp nulled malformed input,
  * while Spark 4's ANSI default throws. If the column is absent the frame
  * passes through unchanged (loan_spark_etl.py:77).
  */
object Dates {

  def transform(df: DataFrame, datetimeCol: String = "created_at"): DataFrame = {
    if (!df.columns.contains(datetimeCol)) return df
    val ts = try_to_timestamp(col(datetimeCol))
    df.withColumn("created_date", to_date(ts))
      .withColumn("created_time", date_format(ts, "HH:mm:ss"))
  }
}
