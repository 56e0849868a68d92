package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.Robust

/** Contract for the median/MAD robust outlier screen (q144): exact
  * medians match hand arithmetic, the screen survives contamination
  * that breaks mean/stddev z-scores, and the approx twin flags the
  * same rows at fixture scale.
  */
class RobustSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", DoubleType)))

  private def df(rows: (Long, Double)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)

  test("hand fixture: median, MAD, and the flag threshold are exact") {
    // values 1..9 plus outlier 100: median of 10 values = (5+6)/2 = 5.5
    // devs: 4.5 3.5 2.5 1.5 0.5 0.5 1.5 2.5 3.5 94.5
    // sorted: .5 .5 1.5 1.5 2.5 2.5 3.5 3.5 4.5 94.5 -> MAD = (2.5+2.5)/2 = 2.5
    // threshold 3*2.5 = 7.5: only dev 94.5 crosses
    val rows = (1L to 9L).map(i => (i, i.toDouble)) :+ (10L, 100.0)
    val out = Robust.madOutliers(df(rows: _*), "k", "v").collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 10L && out(0).getDouble(2) === 94.5)
  }

  test("odd count: median is the single middle rank") {
    // 1..5 plus outlier 50 removed -> odd: 1 2 3 4 100 -> med 3,
    // devs 2 1 0 1 97 -> MAD 1 -> threshold 3: flags 100 only
    val out = Robust.madOutliers(
      df((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 100.0)), "k", "v")
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(5L))
  }

  test("robustness: 20% contamination does not drag the fence (mean/stddev would)") {
    // 8 inliers at ~10, 2 huge outliers: mean/stddev z-score at k=2
    // misses both (stddev exploded); median/MAD flags exactly the two
    val rows = Seq((1L, 9.0), (2L, 9.5), (3L, 10.0), (4L, 10.1),
      (5L, 10.2), (6L, 10.4), (7L, 10.8), (8L, 11.0),
      (9L, 5000.0), (10L, 6000.0))
    val flagged = Robust.madOutliers(df(rows: _*), "k", "v")
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(9L, 10L))
  }

  test("q149 grouped percentiles are bit-equal to percentile() before rounding") {
    import org.apache.spark.sql.functions._
    val li = Queries.t(spark, "/root/testdata/sf0.001", "lineitem")
    val win = graft.ops.Robust.groupedPercentiles(
      li, "l_returnflag", "l_extendedprice", Seq("l_orderkey", "l_linenumber"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val buf = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("ps"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("p25"),
        round(element_at(col("ps"), 2), 4).as("p50"),
        round(element_at(col("ps"), 3), 4).as("p75"))
      .collect()
      .flatMap(r => Seq(0.25, 0.5, 0.75).zipWithIndex.map { case (p, i) =>
        (r.getString(0), p) -> r.getDouble(i + 1)
      }).toMap
    assert(win.keySet === buf.keySet)
    // the window form must reproduce the buffered aggregate's numbers
    // exactly (same interpolation, same 4dp round) — this is the q40
    // retirement contract
    win.foreach { case (k, v) => assert(v === buf(k), s"at $k") }
  }

  test("q149: single-row and two-row groups interpolate like percentile()") {
    import org.apache.spark.sql.functions._
    val tiny = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 10.0), Row(2L, 10.0), Row(3L, 20.0)),
      StructType(Seq(StructField("k", LongType), StructField("v", DoubleType))))
      .withColumn("g", when(col("k") === 1, "solo").otherwise("pair"))
    val out = graft.ops.Robust.groupedPercentiles(tiny, "g", "v", Seq("k"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // solo group: every quantile is the single value
    assert(out(("solo", 0.25)) === 10.0 &&
      out(("solo", 0.5)) === 10.0 && out(("solo", 0.75)) === 10.0)
    // pair group (10, 20): pos = p -> 10 + 10p
    assert(out(("pair", 0.25)) === 12.5)
    assert(out(("pair", 0.5)) === 15.0)
    assert(out(("pair", 0.75)) === 17.5)
  }

  test("approx twin flags the same rows as exact on the dirtied orders fact") {
    val sf = "/root/testdata/sf0.001"
    val dirtied = SparkEntry.queries("q144_mad_outliers") // exact form
    val exact = dirtied(spark, sf).collect().map(_.getLong(0)).toSet
    import org.apache.spark.sql.functions._
    val d = Queries.t(spark, sf, "orders")
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 1009 === 0, col("o_totalprice") * 50.0)
          .when(col("o_orderkey") % 1013 === 0, col("o_totalprice") * -10.0)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    val approx = Robust.madOutliers(d, "o_orderkey", "o_totalprice",
      approx = true).collect().map(_.getLong(0)).toSet
    // planted outliers sit ~10x past the fence; GK rank error at the
    // default accuracy cannot move the fence enough to flip any of them
    assert(approx === exact)
    assert(exact.nonEmpty, "the dirtied fact must flag planted outliers")
  }

  test("weighted percentiles: hand fixture + unit weights recover the rank quantile") {
    import spark.implicits._
    // values 1..4 with weights 1,1,1,7 -> W=10: cum(3)=3 < 5, so the
    // token-weighted median is 4 (the heavy doc), where the unweighted
    // median of the values would be 2.5-ish — exactly the distinction
    // the operator exists to make
    val heavy = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 7L)).toDF("v", "w")
    val got = graft.ops.Robust.weightedPercentiles(heavy, "v", "w", Seq(50, 90, 99))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(50L -> 4L, 90L -> 4L, 99L -> 4L))
    // unit weights over 1..100: the weighted p-quantile IS the rank
    // quantile — smallest v with v >= p
    val unit = (1L to 100L).map(v => (v, 1L)).toDF("v", "w")
    val gotU = graft.ops.Robust.weightedPercentiles(unit, "v", "w", Seq(50, 90, 99))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotU === Map(50L -> 50L, 90L -> 90L, 99L -> 99L))
    // dirty data: null and non-positive weights are excluded, total
    val dirty = Seq((1L, Some(0L)), (2L, Some(-5L)), (3L, None: Option[Long]),
      (4L, Some(2L))).toDF("v", "w")
    val gotD = graft.ops.Robust.weightedPercentiles(dirty, "v", "w", Seq(50))
      .collect()
    assert(gotD.length === 1 && gotD.head.getLong(1) === 4L)
  }
}
