package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Behavior

/** Contract for the behavioral-analytics operators: ordered funnel
  * (q110) strict-order first-occurrence semantics and weekly cohort
  * retention (q111).
  */
class BehaviorSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def eventsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (u, t, w) => (u, t, ts(w)) }
      .toDF("user_id", "event_type", "ts")
  }

  test("funnel: in-order, out-of-order, and partial journeys counted correctly") {
    val ev = eventsDf(Seq(
      // u1: full journey in order
      (1L, "view", "2026-01-01 10:00:00"),
      (1L, "click", "2026-01-01 10:05:00"),
      (1L, "purchase", "2026-01-01 10:10:00"),
      // u2: purchase BEFORE click — reaches step 2 only
      (2L, "view", "2026-01-01 10:00:00"),
      (2L, "purchase", "2026-01-01 10:01:00"),
      (2L, "click", "2026-01-01 10:02:00"),
      // u3: view only
      (3L, "view", "2026-01-01 09:00:00"),
      // u4: click+purchase but never viewed — reaches nothing
      (4L, "click", "2026-01-01 10:00:00"),
      (4L, "purchase", "2026-01-01 10:01:00"),
      // u5: click at the SAME instant as view — strict order excludes it
      (5L, "view", "2026-01-01 10:00:00"),
      (5L, "click", "2026-01-01 10:00:00")))
    val out = Behavior.funnelSteps(ev)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 4L, 2L -> 2L, 3L -> 1L))
  }

  test("funnel: later in-order occurrence still counts after an early out-of-order one") {
    // u1 clicks before viewing, but clicks AGAIN after: the chain uses
    // the earliest click after the view, so the user converts
    val ev = eventsDf(Seq(
      (1L, "click", "2026-01-01 09:00:00"),
      (1L, "view", "2026-01-01 10:00:00"),
      (1L, "click", "2026-01-01 11:00:00"),
      (1L, "purchase", "2026-01-01 12:00:00")))
    val out = Behavior.funnelSteps(ev)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("funnel: monotone non-increasing step counts on the real stream") {
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val users = Behavior.funnelSteps(ev)
      .orderBy("step").collect().map(_.getLong(2)).toSeq
    assert(users.size === 3)
    assert(users === users.sorted.reverse, s"not monotone: $users")
    assert(users.head > 0)
  }

  test("funnel: partition-independent") {
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val a = Behavior.funnelSteps(ev).collect().toSeq
    val b = Behavior.funnelSteps(ev.repartition(7)).collect().toSeq
    assert(a === b)
  }

  test("retention: cohorts anchored at the first-event week, offsets exact") {
    val ev = eventsDf(Seq(
      // u1: first event Wed 2026-01-07 (week of Mon 2026-01-05),
      // active again two weeks later
      (1L, "view", "2026-01-07 10:00:00"),
      (1L, "view", "2026-01-19 10:00:00"),
      // u2: same cohort week, active only that week (two events)
      (2L, "view", "2026-01-05 08:00:00"),
      (2L, "click", "2026-01-11 23:00:00"),
      // u3: later cohort
      (3L, "view", "2026-01-19 10:00:00")))
    val out = Behavior.cohortRetention(ev)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(
      ("2026-01-05", 0L) -> 2L,
      ("2026-01-05", 2L) -> 1L,
      ("2026-01-19", 0L) -> 1L))
  }

  test("retention: week-0 cell of each cohort equals its cohort size on the real stream") {
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val cells = Behavior.cohortRetention(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    val cohortSizes = ev.filter(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(cohortSizes.nonEmpty)
    cohortSizes.foreach { case (w, n) =>
      assert(cells((w, 0L)) === n, s"cohort $w")
    }
  }

  test("sliding windows: a straddling event lands in both overlapping windows") {
    import spark.implicits._
    val ev = Seq(
      (1L, "click", ts("2026-01-01 10:45:00"), 1.0),
      (2L, "click", ts("2026-01-01 10:10:00"), 2.0))
      .toDF("user_id", "event_type", "ts", "value")
    val out = Behavior.slidingWindowCounts(ev).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(2)).toMap
    // event 1 (10:45) is inside [10:00,11:00) and [10:30,11:30);
    // event 2 (10:10) is inside [09:30,10:30) and [10:00,11:00)
    assert(out === Map(
      "2026-01-01 09:30:00.0" -> 1L,
      "2026-01-01 10:00:00.0" -> 2L,
      "2026-01-01 10:30:00.0" -> 1L))
  }

  test("sliding windows: every event counted exactly length/slide times") {
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val n = ev.filter(col("ts").isNotNull).count()
    val total = Behavior.slidingWindowCounts(ev)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(total === 2 * n)
  }

  test("windowed funnel: conversion outside the window is dropped, inside kept") {
    val ev = eventsDf(Seq(
      // u1 converts fully inside 30 minutes
      (1L, "view", "2026-01-01 10:00:00"),
      (1L, "click", "2026-01-01 10:10:00"),
      (1L, "purchase", "2026-01-01 10:20:00"),
      // u2 clicks inside but purchases past the 30-minute deadline
      (2L, "view", "2026-01-01 10:00:00"),
      (2L, "click", "2026-01-01 10:10:00"),
      (2L, "purchase", "2026-01-01 10:45:00"),
      // u3 clicks past the deadline entirely
      (3L, "view", "2026-01-01 10:00:00"),
      (3L, "click", "2026-01-01 11:00:00")))
    val out = Behavior.funnelStepsWindowed(ev)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("windowed funnel: infinite window equals the plain funnel on the real stream") {
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val plain = Behavior.funnelSteps(ev).collect().map(_.toSeq).toSeq
    val wide = Behavior.funnelStepsWindowed(ev, window = "INTERVAL 3650 DAYS")
      .collect().map(_.toSeq).toSeq
    assert(wide === plain)
  }

  test("transitions: hand-checked chain; totals = events - users") {
    val ev = eventsDf(Seq(
      (1L, "view", "2026-01-01 10:00:00"),
      (1L, "click", "2026-01-01 10:05:00"),
      (1L, "view", "2026-01-01 10:10:00"),
      (2L, "view", "2026-01-01 09:00:00"),
      (2L, "click", "2026-01-01 09:05:00")))
      .withColumn("event_id", col("user_id") * 100 + monotonically_increasing_id())
    val out = Behavior.transitionCounts(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("view", "click") -> 2L, ("click", "view") -> 1L))
  }

  test("transitions: total transitions = events - distinct users on the real stream") {
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
    val total = Behavior.transitionCounts(ev).agg(sum("cnt")).collect()(0).getLong(0)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(total === expected)
  }

  test("rfm: quartile scores cover 1..4 and align with the raw dimensions") {
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val rows = Behavior.rfmSegments(ev).collect()
    assert(rows.length > 10)
    // every score in 1..4
    Seq(4, 5, 6).foreach { i =>
      assert(rows.forall(r => r.getLong(i) >= 1 && r.getLong(i) <= 4))
    }
    // the user with the most purchases scores f=1; most recent scores r=1
    val best = rows.minBy(r => (-r.getLong(2), r.getLong(0)))
    assert(best.getLong(5) === 1L)
    val freshest = rows.minBy(r => (r.getLong(1), r.getLong(0)))
    assert(freshest.getLong(4) === 1L)
  }

  test("rfm: two-pass distributed ntile equals the global-window form bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val got = Behavior.rfmSegments(ev).collect().map(_.toSeq).toSeq
    // the replaced single-partition formulation, inline as the reference
    val purchases = ev.filter(col("event_type") === "purchase" &&
      col("ts").isNotNull && col("user_id").isNotNull)
    val maxTs = purchases.agg(max(col("ts")).as("max_ts"))
    val per = purchases.groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("frequency"),
        round(sum(col("value")), 2).as("monetary"))
      .crossJoin(broadcast(maxTs))
      .select(col("user_id"),
        datediff(col("max_ts").cast("date"), col("last_ts").cast("date"))
          .cast("long").as("recency_days"),
        col("frequency"), col("monetary"))
    def tile(order: Seq[org.apache.spark.sql.Column]) =
      ntile(4).over(Window.orderBy(order: _*)).cast("long")
    val want = per
      .withColumn("r_score", tile(Seq(asc("recency_days"), asc("user_id"))))
      .withColumn("f_score", tile(Seq(desc("frequency"), asc("user_id"))))
      .withColumn("m_score", tile(Seq(desc("monetary"), asc("user_id"))))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("rfm: plan has no single global window partition") {
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val plan = Behavior.rfmSegments(ev).queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("attribution: last/first touch inside the lookback; direct when none; ties by event_id") {
    import spark.implicits._
    val ev = Seq(
      // u1: view -> click -> purchase: last=click, first=view
      (1L, 1L, "view", "2026-01-01 10:00:00", 5.0),
      (2L, 1L, "click", "2026-01-01 10:30:00", 0.0),
      (3L, 1L, "purchase", "2026-01-01 11:00:00", 100.0),
      // u2: touch 8 days ago -> outside the 168h lookback: direct
      (4L, 2L, "view", "2026-01-01 10:00:00", 0.0),
      (5L, 2L, "purchase", "2026-01-10 10:00:00", 50.0),
      // u3: no touch at all: direct
      (6L, 3L, "purchase", "2026-01-01 09:00:00", 25.0),
      // u4: two touches at the SAME instant -> higher event_id wins last
      (7L, 4L, "view", "2026-01-01 10:00:00", 0.0),
      (8L, 4L, "click", "2026-01-01 10:00:00", 0.0),
      (9L, 4L, "purchase", "2026-01-01 10:05:00", 10.0))
      .map { case (e, u, t, w, v) => (e, u, t, ts(w), v) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Behavior.attribution(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(("last_touch", "click")) === ((2L, 110.0)))
    assert(out(("last_touch", "direct")) === ((2L, 75.0)))
    assert(out(("first_touch", "view")) === ((2L, 110.0)))
    assert(out(("first_touch", "direct")) === ((2L, 75.0)))
  }

  test("attribution: each model's purchase counts sum to the purchase total; partition-independent") {
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val total = ev.filter(col("event_type") === "purchase" &&
      col("ts").isNotNull && col("user_id").isNotNull).count()
    val rows = Behavior.attribution(ev).collect()
    Seq("last_touch", "first_touch").foreach { m =>
      assert(rows.filter(_.getString(0) == m).map(_.getLong(2)).sum === total, m)
    }
    val b = Behavior.attribution(ev.repartition(7)).collect().map(_.toSeq).toSeq
    assert(rows.map(_.toSeq).toSeq === b)
  }

  test("rolling actives: under-k estimates equal exact distinct users over the window") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2026-01-01 10:00:00"), (2L, "2026-01-01 11:00:00"),
      (2L, "2026-01-02 10:00:00"), (3L, "2026-01-02 11:00:00"),
      (4L, "2026-01-04 10:00:00"))
      .map { case (u, w) => (u, ts(w), "view") }
      .toDF("user_id", "ts", "event_type")
    val out = Behavior.rollingActiveUsers(ev, windowDays = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val d0 = out.keys.min
    // day 0: {1,2}; day 1: {1,2,3} over 2-day window; day 3: {4} (gap -
    // day 2 absent, so only 1 day present in its window)
    assert(out(d0) === ((2L, 1L)))
    assert(out(d0 + 1) === ((3L, 2L)))
    assert(out(d0 + 3) === ((1L, 1L)))
  }

  test("rolling actives: windowDays=1 equals exact daily distinct users on the real stream") {
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val got = Behavior.rollingActiveUsers(ev, windowDays = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ev.filter(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy(floor(unix_timestamp(col("ts")) / 86400).as("d"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(want.nonEmpty)
    // daily distincts sit far under k=1024, so the sketch IS exact
    assert(got === want)
  }

  test("rate anomaly: pre-epoch timestamps floor into the previous hour") {
    import spark.implicits._
    // -10s is hour -1 under floor division (the oracle's semantics);
    // truncation toward zero would put it in hour 0 with the +10s event
    val ev = Seq(
      (1L, "click", new Timestamp(-10000L)),
      (2L, "click", new Timestamp(10000L)))
      .toDF("event_id", "event_type", "ts")
    val hours = ev.groupBy(floor(unix_timestamp(col("ts")) / 3600).as("h"))
      .count().collect().map(_.getLong(0)).sorted
    assert(hours === Array(-1L, 0L))
    // and the operator's own bucketing agrees: hour 0 sees ONE trailing
    // hour (hour -1) of count 1, so its cnt*1 > 2*1 test fails quietly
    val out = Behavior.rateAnomalies(ev).collect()
    assert(out.isEmpty, out.mkString(","))
  }

  test("rate anomaly: a planted 3x burst is flagged, steady hours are not") {
    import spark.implicits._
    // steady: 10 events/hour for hours 0..23; burst: 30 events in hour 24
    val steady = (0 until 24).flatMap(h => (0 until 10).map(i =>
      (h.toLong * 100 + i, "click", new Timestamp(h * 3600L * 1000 + i * 1000))))
    val burst = (0 until 30).map(i =>
      (2400L + i, "click", new Timestamp(24 * 3600L * 1000 + i * 1000)))
    val ev = (steady ++ burst).toDF("event_id", "event_type", "ts")
    val out = Behavior.rateAnomalies(ev).collect()
    assert(out.length === 1)
    assert(out(0).getString(0) === "click")
    assert(out(0).getLong(1) === 24L)
    assert(out(0).getLong(2) === 30L)
    assert(out(0).getLong(3) === 240L) // trailing sum over 24 steady hours
  }

  test("rate anomaly: trailing window is VALUE range - a gap does not drag old hours in") {
    import spark.implicits._
    // 10/hour at hours 0..5, silence until hour 40, then 15 at hour 40:
    // the trailing [16,39] window is EMPTY - hour 40 must NOT be flagged
    // against the ancient hours (trail_hours = 0 filters it)
    val early = (0 until 6).flatMap(h => (0 until 10).map(i =>
      (h.toLong * 100 + i, "click", new Timestamp(h * 3600L * 1000 + i * 1000))))
    val late = (0 until 15).map(i =>
      (9000L + i, "click", new Timestamp(40 * 3600L * 1000 + i * 1000)))
    val ev = (early ++ late).toDF("event_id", "event_type", "ts")
    val out = Behavior.rateAnomalies(ev).collect()
    assert(!out.exists(_.getLong(1) === 40L), out.mkString(","))
  }

  test("rate anomaly: partition-independent on the real stream") {
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val a = Behavior.rateAnomalies(ev).collect().map(_.toSeq).toSeq
    val b = Behavior.rateAnomalies(ev.repartition(7)).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  // ------------------------------------------- funnel latencies (q148)

  test("funnel latencies: hand-exact medians (odd and even group sizes), strict order") {
    val ev = eventsDf(Seq(
      // u1: vc = 10 min, cp = 30 min
      (1L, "view", "2026-01-01 10:00:00"),
      (1L, "click", "2026-01-01 10:10:00"),
      (1L, "purchase", "2026-01-01 10:40:00"),
      // u2: vc = 30 min, no purchase
      (2L, "view", "2026-01-01 10:00:00"),
      (2L, "click", "2026-01-01 10:30:00"),
      // u3: vc = 5 min, cp = 85 min
      (3L, "view", "2026-01-01 10:00:00"),
      (3L, "click", "2026-01-01 10:05:00"),
      (3L, "purchase", "2026-01-01 11:30:00"),
      // u4: purchase BEFORE click — excluded from cp
      (4L, "view", "2026-01-01 10:00:00"),
      (4L, "purchase", "2026-01-01 10:01:00"),
      (4L, "click", "2026-01-01 10:02:00")))
    val out = Behavior.funnelStepLatencies(ev).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val m = 60L * 1000000L // minute in micros
    // vc lats: u1 10m, u2 30m, u3 5m, u4 2m -> sorted 2,5,10,30 (even):
    //   median (5+10)/2 = 7.5m, mean 47/4 = 11.75m
    assert(out("view->click") ===
      ((4L, 7.5 * m, 11.75 * m)))
    // cp lats: u1 30m, u3 85m (even): median and mean both 57.5m
    assert(out("click->purchase") === ((2L, 57.5 * m, 57.5 * m)))
  }

  test("funnel latencies: partition-independent on the real events") {
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val a = Behavior.funnelStepLatencies(ev).collect().map(_.toSeq).toSeq
    val b = Behavior.funnelStepLatencies(ev.repartition(9)).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  // ---------------------------------------------- session paths (q150)

  private def eventsDfWithIds(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, t, w), i) => (i.toLong, u, t, ts(w)) }
      .toDF("event_id", "user_id", "event_type", "ts")
  }

  test("session paths: gap splits, order within session, maxLen truncation") {
    val ev = eventsDfWithIds(Seq(
      // u1 session 1: view->click (2 min apart); session 2 after 60 min: purchase
      (1L, "view", "2026-01-01 10:00:00"),
      (1L, "click", "2026-01-01 10:02:00"),
      (1L, "purchase", "2026-01-01 11:30:00"),
      // u2 one session of 7 events: truncated to maxLen=5
      (2L, "view", "2026-01-01 10:00:00"),
      (2L, "view", "2026-01-01 10:01:00"),
      (2L, "view", "2026-01-01 10:02:00"),
      (2L, "view", "2026-01-01 10:03:00"),
      (2L, "view", "2026-01-01 10:04:00"),
      (2L, "click", "2026-01-01 10:05:00"),
      (2L, "purchase", "2026-01-01 10:06:00"),
      // u3: same path as u1's first session
      (3L, "view", "2026-01-01 12:00:00"),
      (3L, "click", "2026-01-01 12:10:00")))
    val out = Behavior.sessionPaths(ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "view->click" -> 2L,
      "purchase" -> 1L,
      "view->view->view->view->view" -> 1L))
  }

  test("session paths: partition-independent and total on the real events") {
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val a = Behavior.sessionPaths(ev).collect().map(_.toSeq).toSeq
    val b = Behavior.sessionPaths(ev.repartition(11)).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
