package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The injected optimizer rule ([[graft.plans.DotProductRewrite]] via
  * GraftExtensions): a user-written `aggregate(zip_with(...))` dot
  * product is rewritten to the native vec_dot, result-preserving;
  * near-miss shapes are left alone.
  */
class DotProductRewriteSpec extends SparkSpec {

  private def hofDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  private lazy val df = {
    val rnd = new scala.util.Random(77)
    val rows = (0 until 64).map { _ =>
      Row(Seq.fill(16)(rnd.nextFloat()), Seq.fill(16)(rnd.nextFloat()))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("a", ArrayType(FloatType)),
        StructField("b", ArrayType(FloatType)))))
  }

  test("the HOF dot idiom is rewritten to vec_dot by the injected rule") {
    val q = df.select(hofDot(col("a"), col("b")).as("d"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_dot"), optimized)
    assert(!optimized.contains("aggregate("), optimized)
    // and the rewritten query returns exactly what the native form does
    val native = df.select(
      graft.functions.VectorFunctions.vecDot(col("a"), col("b")).as("d"))
    assert(q.exceptAll(native).count() === 0)
    assert(native.exceptAll(q).count() === 0)
  }

  test("near-miss shapes are NOT rewritten") {
    // different zero
    val z1 = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(1.0), (acc, v) => acc + v).as("d"))
    assert(!z1.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    // different merge (acc + 2*v)
    val z2 = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v * 2).as("d"))
    assert(!z2.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    // sum lambda, not a product zip (plain array sum)
    val z3 = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") + y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!z3.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    // int arrays: not a float/double vector type -> untouched
    val idf = spark.range(4).select(
      array(lit(1), lit(2)).as("x"), array(lit(3), lit(4)).as("y"))
    val z4 = idf.select(aggregate(
      zip_with(col("x"), col("y"), (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!z4.queryExecution.optimizedPlan.toString.contains("vec_dot"))
  }

  test("double-array sides match without an explicit cast (SimplifyCasts)") {
    val ddf = df.select(
      transform(col("a"), x => x.cast("double")).as("ad"),
      transform(col("b"), x => x.cast("double")).as("bd"))
    val q = ddf.select(aggregate(
      zip_with(col("ad"), col("bd"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("vec_dot"),
      q.queryExecution.optimizedPlan.toString)
    assert(q.count() === 64)
  }
}
