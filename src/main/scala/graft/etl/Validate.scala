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

  /** Per-column profile of numeric columns — null count, distinct count,
    * min, max, mean — as one row per column, computed in a single
    * aggregation job (all columns' aggregates in one pass, then a narrow
    * explode of the C-row result).
    *
    * `approx = true` (the default a per-batch monitor should run at
    * scale) estimates distincts with HyperLogLog++ sketches: one ordinary
    * hash-aggregate pass, mergeable map-side partials. `approx = false`
    * is exact `count_distinct` — with several distinct aggregates
    * Catalyst plans an Expand (the input duplicated once per column) and
    * shuffles every distinct value of every column, which grows
    * superlinearly with the table; keep it for small audits and oracle
    * anchoring (q51).
    */
  def profileNumeric(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    val structs = cols.zipWithIndex.map { case (c, i) =>
      val distinct =
        if (approx) approx_count_distinct(col(c), 0.02)
        else count_distinct(col(c))
      struct(
        lit(c).as("col_name"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        distinct.as("n_distinct"),
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
