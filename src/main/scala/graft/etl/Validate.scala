package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Data validation — the north-star "DataFrame ops + data validation"
  * counterpart to the reference's per-column existence guards
  * (loan_spark_etl.py:77,105-113): declarative schema conformance plus a
  * one-pass column profile for drift monitoring.
  *
  * Scale shape: [[conformance]] is pure metadata (no job at all);
  * [[profileNumeric]] is ONE aggregation pass over the table computing
  * every column's stats together (partial+final agg), never a
  * per-column scan loop.
  */
object Validate {

  final case class Conformance(
      missing: Seq[String],
      extra: Seq[String],
      typeMismatch: Seq[(String, String, String)]) {
    def ok: Boolean = missing.isEmpty && typeMismatch.isEmpty
  }

  /** Compare a frame's schema against the expected one: missing columns,
    * unexpected columns, and same-name/different-type columns.
    */
  def conformance(df: DataFrame, expected: StructType): Conformance = {
    val have = df.schema.map(f => f.name -> f.dataType).toMap
    val want = expected.map(f => f.name -> f.dataType).toMap
    Conformance(
      missing = expected.map(_.name).filterNot(have.contains),
      extra = df.schema.map(_.name).filterNot(want.contains),
      typeMismatch = expected.flatMap { f =>
        have.get(f.name)
          .filter(_ != f.dataType)
          .map(dt => (f.name, f.dataType.simpleString, dt.simpleString))
      })
  }

  /** Per-column profile of numeric columns — null count, exact distinct
    * count, min, max, mean — as one row per column, computed in a single
    * aggregation job (all columns' aggregates in one pass, then a narrow
    * explode of the C-row result).
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val structs = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("double").as("min_val"),
        max(col(c)).cast("double").as("max_val"),
        round(avg(col(c)), 4).as("mean_val")).as(s"c$i")
    }
    df.agg(structs.head, structs.tail: _*)
      .select(explode(array(cols.indices.map(i => col(s"c$i")): _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }
}
