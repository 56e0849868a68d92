package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class ValidateSpec extends SparkSpec {

  private val expected = StructType(Seq(
    StructField("loan_id", StringType),
    StructField("amount", DoubleType),
    StructField("status", StringType)))

  test("conformance: ok schema, missing column, type mismatch, extra column") {
    import spark.implicits._
    val good = Seq(("L1", 1.0, "A")).toDF("loan_id", "amount", "status")
    assert(Validate.conformance(good, expected).ok)

    val missing = good.drop("amount")
    val c1 = Validate.conformance(missing, expected)
    assert(!c1.ok && c1.missing == Seq("amount"))

    val mistyped = good.withColumn("amount", col("amount").cast("string"))
    val c2 = Validate.conformance(mistyped, expected)
    assert(!c2.ok && c2.typeMismatch == Seq(("amount", "double", "string")))

    val extra = good.withColumn("surplus", lit(1))
    val c3 = Validate.conformance(extra, expected)
    assert(c3.ok && c3.extra == Seq("surplus"))
  }

  test("profileNumeric: one row per column with correct null/distinct counts") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(10.0)),
      (Some(2.0), None),
      (Some(2.0), Some(30.0))).toDF("a", "b")
    val prof = Validate.profileNumeric(df, Seq("a", "b")).collect()
    assert(prof.map(_.getString(0)).toSeq == Seq("a", "b"))
    val a = prof(0)
    assert(a.getLong(1) == 0 && a.getLong(2) == 2 &&
      a.getDouble(3) == 1.0 && a.getDouble(4) == 2.0)
    val b = prof(1)
    assert(b.getLong(1) == 1 && b.getLong(2) == 2 && b.getDouble(5) == 20.0)
  }

  test("profileNumeric plans a single aggregation (no per-column jobs)") {
    val li = graft.Queries.t(spark, "/root/testdata/sf0.001", "lineitem")
    val plan = Validate.profileNumeric(li, Seq("l_quantity", "l_discount"))
      .queryExecution.executedPlan.toString
    // exactly one scan of the table feeds all column profiles
    assert("FileScan|Scan parquet".r.findAllIn(plan).size <= 1, plan)
  }
}
