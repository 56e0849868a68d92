package graft

import org.apache.spark.sql.functions._

/** Round-3 relational extensions: cube/pivot/percentile/stats/approx
  * sketches and the temporal joins. Oracle parity runs through the
  * driver's DuckDB gate; these tests pin the properties the oracle can't
  * see — plan shape (no nested-loop degeneration) and sketch accuracy.
  */
class RelationalExtSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("as-of join: plan has no BroadcastNestedLoopJoin / CartesianProduct") {
    val plan = q("q38_asof_join").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("range join: bucketed equi-join, no nested-loop") {
    val plan = q("q39_range_join").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("as-of join agrees with a directly-computed per-row maximum") {
    import spark.implicits._
    val events = Queries.t(spark, sf, "events")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("cts"), $"event_id".as("cid"))
    // oracle-by-construction: all-pairs max (fine at sf0.001 test scale)
    val expected = events.filter($"event_type" === "purchase")
      .join(clicks, $"user_id" === $"cu" && $"cts" <= $"ts", "left")
      .groupBy($"event_id", $"user_id")
      .agg(max(struct($"cts", $"cid")).getField("cid").as("last_click_id"))
      .orderBy("event_id")
    val got = q("q38_asof_join")
    assert(got.collect().toSeq == expected.collect().toSeq)
  }

  test("range join agrees with the direct non-equi-join count") {
    import spark.implicits._
    val events = Queries.t(spark, sf, "events")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("cts"))
    val expected = events.filter($"event_type" === "purchase")
      .join(
        clicks,
        $"user_id" === $"cu" &&
          $"cts" > $"ts" - expr("INTERVAL 10 MINUTES") && $"cts" <= $"ts",
        "left")
      .groupBy($"event_id", $"user_id")
      .agg(count($"cu").as("n_clicks_10m"))
      .orderBy("event_id")
    assert(q("q39_range_join").collect().toSeq == expected.collect().toSeq)
  }

  test("approx_count_distinct within 5% of exact at rsd=0.02") {
    import spark.implicits._
    val li = Queries.t(spark, sf, "lineitem")
    val exact = li.groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("parts"),
        countDistinct($"l_suppkey").as("supps"))
    val rows = q("q42_approx_distinct")
      .join(exact, "l_returnflag")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val apxP = r.getAs[Long]("apx_parts").toDouble
      val exP = r.getAs[Long]("parts").toDouble
      val apxS = r.getAs[Long]("apx_supps").toDouble
      val exS = r.getAs[Long]("supps").toDouble
      assert(math.abs(apxP - exP) / exP < 0.05, s"parts: $apxP vs $exP")
      assert(math.abs(apxS - exS) / exS < 0.05, s"supps: $apxS vs $exS")
    }
  }

  test("q67 approx_percentile within rank-error bound of exact q40") {
    // Greenwald-Khanna at accuracy=10000 guarantees the returned element's
    // RANK is within n/10000 of the target rank (a value bound would be
    // wrong: exact `percentile` interpolates BETWEEN elements, GK returns
    // an actual element). Assert rank(estimate) ∈ p·n ± 2ε·n.
    import spark.implicits._
    val li = Queries.t(spark, sf, "lineitem")
    val eps = 1.0 / 10000
    val rows = q("q67_approx_percentile").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      Seq(0.25 -> r.getDouble(1), 0.5 -> r.getDouble(2), 0.75 -> r.getDouble(3))
        .foreach { case (p, v) =>
          val c = li.filter($"l_returnflag" === flag).agg(
            count(lit(1)).as("n"),
            sum(when($"l_extendedprice" < v, 1L).otherwise(0L)).as("nlt"),
            sum(when($"l_extendedprice" <= v, 1L).otherwise(0L)).as("nle")).head()
          val (n, nlt, nle) = (c.getLong(0).toDouble, c.getLong(1), c.getLong(2))
          assert(nlt <= (p + 2 * eps) * n && nle >= (p - 2 * eps) * n,
            s"$flag p$p: estimate $v has rank window [$nlt, $nle] of $n")
        }
    }
  }

  test("cube emits all four grouping-set combinations") {
    val rows = q("q36_cube").collect()
    val both = rows.count(r => r.isNullAt(0) && r.isNullAt(1))
    val flagOnly = rows.count(r => !r.isNullAt(0) && r.isNullAt(1))
    val statusOnly = rows.count(r => r.isNullAt(0) && !r.isNullAt(1))
    val neither = rows.count(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(both == 1 && flagOnly > 0 && statusOnly > 0 && neither > 0)
  }

  test("pivot columns are the static value list") {
    assert(q("q37_pivot").columns.toSeq == Seq("l_returnflag", "F", "O"))
  }
}
