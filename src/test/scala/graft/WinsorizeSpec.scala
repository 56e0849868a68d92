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

  test("approx fences: clipped counts stay within the GK rank-error bound of the exact form") {
    val li = Queries.t(spark, sf, "lineitem")
    def run(approx: Boolean, accuracy: Int = 10000) = graft.ops.Winsorize
      .winsorizedAgg(li, "l_returnflag", "l_extendedprice",
        approxFences = approx, accuracy = accuracy)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val exact = run(approx = false)

    // deliberately coarse sketch: rank error <= n/accuracy per fence,
    // so each side's clipped count moves by at most that many rows
    // (+2 slack: the exact fence interpolates between values and both
    // fences are 4dp-quantized)
    val accuracy = 100
    val coarse = run(approx = true, accuracy = accuracy)
    assert(coarse.keySet === exact.keySet)
    exact.foreach { case (flag, (cnt, nLo, nHi)) =>
      val (cntA, nLoA, nHiA) = coarse(flag)
      assert(cntA === cnt, "fence mode must not change row counts")
      val bound = cnt / accuracy + 2
      assert(math.abs(nLoA - nLo) <= bound,
        s"$flag lo-clip drift ${math.abs(nLoA - nLo)} > $bound (n=$cnt)")
      assert(math.abs(nHiA - nHi) <= bound,
        s"$flag hi-clip drift ${math.abs(nHiA - nHi)} > $bound (n=$cnt)")
    }

    // at the DEFAULT accuracy the sketch is rank-exact at this scale
    // (accuracy >> group sizes): clip counts match the exact fences to
    // within ONE row per side — the residual is not rank error but the
    // fence-definition boundary (GK returns the data element AT the
    // rank; the exact form interpolates strictly past it, so the
    // element itself flips sides)
    val fine = run(approx = true)
    exact.foreach { case (flag, (cnt, nLo, nHi)) =>
      val (cntA, nLoA, nHiA) = fine(flag)
      assert(cntA === cnt)
      assert(math.abs(nLoA - nLo) <= 1 && math.abs(nHiA - nHi) <= 1,
        s"$flag default-accuracy approx fences drifted beyond the boundary element: " +
          s"exact ($nLo, $nHi) vs approx ($nLoA, $nHiA)")
    }

    // the approx plan must carry NO unbounded-buffer percentile: the
    // whole point is bounded state per group at 100 TB
    val approxPlan = graft.ops.Winsorize
      .winsorizedAgg(li, "l_returnflag", "l_extendedprice", approxFences = true)
      .queryExecution.optimizedPlan.toString
    assert(approxPlan.contains("approx_percentile"), approxPlan.take(500))
    assert(!"(?<!approx_)percentile\\(".r.findFirstIn(approxPlan).isDefined,
      "approx mode still plans the unbounded exact percentile")
  }
}
