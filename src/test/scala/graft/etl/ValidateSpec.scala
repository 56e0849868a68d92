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

  test("profileNumeric(approx): no Expand in the plan, estimates within 2% rel err") {
    val li = graft.Queries.t(spark, "/root/testdata/sf0.001", "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val approx = Validate.profileNumeric(li, cols, approx = true)
    // exact multi-column count_distinct forces an Expand (input duplicated
    // per distinct agg) + a shuffle of every distinct value; the HLL++
    // sketch path must plan an ordinary partial+final hash aggregate
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    assert(Validate.profileNumeric(li, cols)
      .queryExecution.executedPlan.toString.contains("Expand"),
      "exact path no longer plans Expand — update this spec's premise")
    val est = approx.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = Validate.profileNumeric(li, cols).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    cols.foreach { c =>
      val err = math.abs(est(c) - exact(c)).toDouble / exact(c)
      assert(err <= 0.02, s"$c: approx ${est(c)} vs exact ${exact(c)} (rel err $err)")
    }
    // non-distinct stats are identical on both paths
    val aRows = approx.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
      r.getDouble(4), r.getDouble(5))).toSet
    val eRows = Validate.profileNumeric(li, cols).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(aRows == eRows)
  }
}
