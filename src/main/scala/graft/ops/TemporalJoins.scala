package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join shapes the reference lacks but any event pipeline needs:
  * as-of join and bounded range join — built to scale, not as non-equi
  * cross products.
  *
  * Both are expressed over the `events` table (the reference's micro-batch
  * file stream is morally an event stream, SURVEY.md §2.9): `purchase`
  * events probe against `click` events of the same user.
  *
  * Scale notes (the whole point of these implementations):
  *
  *   - [[asOfLastClick]] is ONE shuffle on the join key. The naive form —
  *     `probe JOIN ref ON key = key AND ref.ts <= probe.ts` + max — is a
  *     non-equi join that degenerates to BroadcastNestedLoopJoin (the q23
  *     round-1 anti-pattern). Instead both sides are UNIONed, tagged, and
  *     scanned once per key with a running `last(ignoreNulls)` window: cost
  *     is sort-within-partition, no pair explosion, and it survives 100 TB
  *     as long as a single key's history fits a partition (salt-by-time
  *     range if it doesn't).
  *   - [[rangeJoinCount]] buckets time into window-width slots so the range
  *     predicate becomes an EQUI-join on (key, bucket): each probe row
  *     explodes to exactly 2 candidate buckets, each ref row lands in 1, so
  *     the join fan-out is bounded by true matches + one adjacent bucket —
  *     never all-pairs. This is the standard interval-bucketing trick
  *     (cf. Spark's own range-join hints in Databricks runtime docs, and
  *     Flink's interval join, which keeps the same per-key time-bucketed
  *     state).
  */
object TemporalJoins {

  /** For each `purchase` event: the id of the latest `click` event of the
    * same user at-or-before its timestamp (null if none).
    *
    * Deterministic: clicks sort before purchases at equal ts (side 0 < 1,
    * "at-or-before" includes equal-ts clicks); equal-ts clicks resolve to
    * the max click_id (ascending order, running `last`).
    */
  def asOfLastClick(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(
        col("user_id"), col("ts"), lit(0).as("side"),
        col("event_id").as("click_id"),
        lit(null).cast("long").as("event_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(
        col("user_id"), col("ts"), lit(1).as("side"),
        lit(null).cast("long").as("click_id"),
        col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("click_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("last_click_id"))
      .orderBy("event_id")
  }

  /** DuckDB oracle for [[asOfLastClick]] — the same union+window shape
    * (deterministic under ties, unlike raw ASOF JOIN syntax).
    */
  val asOfOracleSql: String =
    """WITH tagged AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, 0 AS side,
      |    event_id AS click_id, CAST(NULL AS BIGINT) AS event_id
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, CAST(ts AS TIMESTAMP), 1, NULL, event_id
      |  FROM events WHERE event_type = 'purchase'),
      |scanned AS (
      |  SELECT event_id, user_id, side,
      |    last_value(click_id IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts, side, click_id NULLS LAST
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id
      |  FROM tagged)
      |SELECT event_id, user_id, last_click_id
      |FROM scanned WHERE side = 1 ORDER BY event_id""".stripMargin

  private val windowMicros = 10L * 60 * 1000 * 1000 // 10 minutes

  /** For each `purchase` event: how many `click` events of the same user
    * fell in the half-open interval (ts - 10 min, ts].
    *
    * The 10-minute range predicate is rewritten as an equi-join on
    * (user_id, time_bucket): bucket width == range width, so every
    * qualifying click is in the purchase's own bucket or the previous one.
    */
  def rangeJoinCount(events: DataFrame): DataFrame = {
    val bucket = (c: org.apache.spark.sql.Column) =>
      floor(unix_micros(c) / windowMicros)
    val clicks = events.filter(col("event_type") === "click")
      .select(
        col("user_id").as("c_user"), col("ts").as("c_ts"),
        bucket(col("ts")).as("b"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val probes = purchases
      .withColumn("b", explode(array(bucket(col("ts")) - 1, bucket(col("ts")))))
    val counts = probes
      .join(
        clicks,
        probes("user_id") === clicks("c_user") && probes("b") === clicks("b") &&
          clicks("c_ts") > probes("ts") - expr("INTERVAL 10 MINUTES") &&
          clicks("c_ts") <= probes("ts"))
      .groupBy(probes("event_id").as("event_id"))
      .agg(count(lit(1)).as("n"))
    purchases
      .join(counts, Seq("event_id"), "left")
      .select(
        col("event_id"), col("user_id"),
        coalesce(col("n"), lit(0L)).as("n_clicks_10m"))
      .orderBy("event_id")
  }

  /** DuckDB oracle for [[rangeJoinCount]] — the range predicate written
    * directly (DuckDB's optimizer handles the inequality join at oracle
    * scale; the bucketing above is the distributed-scale rewrite).
    */
  val rangeOracleSql: String =
    """WITH clicks AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id,
      |  (SELECT count(*) FROM clicks c
      |   WHERE c.user_id = p.user_id
      |     AND c.ts > p.ts - INTERVAL '10 minutes'
      |     AND c.ts <= p.ts) AS n_clicks_10m
      |FROM purchases p ORDER BY p.event_id""".stripMargin
}
