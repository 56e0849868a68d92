package graft

import org.apache.spark.sql.functions._

/** Contract for winsorized aggregates (q124): clipping is real and
  * bounded, and the least/greatest clip agrees with an independently
  * formulated CASE clip.
  */
class WinsorizeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("clipping is real and bounded: ~5% clipped each side, counts preserved") {
    val li = Queries.t(spark, sf, "lineitem")
    val out = SparkEntry.queries("q124_winsorize")(spark, sf).collect()
    assert(out.nonEmpty)
    val rawCnt = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (flag, cnt, nLo, nHi) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cnt === rawCnt(flag))
      // 5% fences: at most ~5% + interpolation slack clipped per side
      assert(nLo <= cnt * 6 / 100 + 1, s"$flag nLo=$nLo of $cnt")
      assert(nHi <= cnt * 6 / 100 + 1, s"$flag nHi=$nHi of $cnt")
      assert(nLo > 0 && nHi > 0, s"$flag clipped nothing - fences not binding")
    }
  }

  test("least/greatest clip agrees with an independent CASE formulation") {
    val li = Queries.t(spark, sf, "lineitem")
    val fences = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.05D, 0.95D))").as("ps"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("lo"),
        round(element_at(col("ps"), 2), 4).as("hi"))
    val viaCase = li.join(broadcast(fences), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(
        when(col("l_extendedprice") < col("lo"), col("lo"))
          .when(col("l_extendedprice") > col("hi"), col("hi"))
          .otherwise(col("l_extendedprice"))), 2).as("wins_sum"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val out = SparkEntry.queries("q124_winsorize")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(out === viaCase)
  }
}
