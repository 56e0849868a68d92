package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot change capture — the ETL primitive behind SCD maintenance,
  * incremental re-processing, and "what moved since yesterday" audits:
  * given two snapshots of a keyed table, emit each key's change class.
  *
  * Reference scope: the reference re-loads its full dimension CSVs per
  * run (`loan_spark_etl.py` ingest stage); change capture is what a
  * production warehouse runs instead of full reloads.
  *
  * Shape, scale-first: ONE full-outer equi-join on the key — both
  * snapshots shuffle exactly once, co-partitioned; the value comparison
  * is in-row null-safe equality over the named columns (no hashing
  * detour, so two rows differing only in a null-vs-value column still
  * classify as changed). Output = changed keys only, typically a tiny
  * fraction of the snapshot. AQE skew-splits a hot key, though keys are
  * unique per snapshot by contract.
  */
object ChangeCapture {

  /** Per-key change class between `oldDf` and `newDf`:
    * 'added' (key only in new), 'removed' (key only in old),
    * 'changed' (both, any value column differs under null-safe
    * equality). Unchanged keys are dropped. Output: key columns +
    * change_type.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty)
    val o = oldDf.select((keyCols ++ valueCols).map(col): _*)
      .withColumnsRenamed(valueCols.map(c => c -> s"__old_$c").toMap)
      .withColumn("__in_old", lit(true))
    val n = newDf.select((keyCols ++ valueCols).map(col): _*)
      .withColumnsRenamed(valueCols.map(c => c -> s"__new_$c").toMap)
      .withColumn("__in_new", lit(true))
    val joined = o.join(n, keyCols, "full_outer")
    val anyDiff = valueCols
      .map(c => !(col(s"__old_$c") <=> col(s"__new_$c")))
      .reduce(_ || _)
    joined
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(anyDiff, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) :+ col("change_type"): _*)
      .orderBy(keyCols.map(col): _*)
  }

  /** The APPLY-able delta between `oldDf` and `newDf`: key columns +
    * change_type + the NEW value columns (null for removed keys) — the
    * payload a MERGE needs, where [[snapshotDiff]] is the audit view.
    * Same single full-outer join shape.
    */
  def snapshotDelta(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty)
    val o = oldDf.select((keyCols ++ valueCols).map(col): _*)
      .withColumnsRenamed(valueCols.map(c => c -> s"__old_$c").toMap)
      .withColumn("__in_old", lit(true))
    val n = newDf.select((keyCols ++ valueCols).map(col): _*)
      .withColumnsRenamed(valueCols.map(c => c -> s"__new_$c").toMap)
      .withColumn("__in_new", lit(true))
    val anyDiff = valueCols
      .map(c => !(col(s"__old_$c") <=> col(s"__new_$c")))
      .reduce(_ || _)
    o.join(n, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(anyDiff, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) ++ (col("change_type") +:
        valueCols.map(c => col(s"__new_$c").as(c))): _*)
  }

  /** MERGE INTO — apply a [[snapshotDelta]] to a snapshot, producing the
    * next snapshot: removed keys drop, added/changed keys take the
    * delta's values, untouched keys pass through unchanged.
    *
    * Shape, scale-first: ONE keyed full-outer equi-join (snapshot and
    * delta each shuffle once, co-partitioned; the delta side is
    * typically a tiny fraction and broadcasts) + an in-row coalesce
    * projection — the exact plan a warehouse MERGE compiles to when
    * every key is unique per side. Round-trip law (spec-pinned):
    * applyDelta(prev, snapshotDelta(prev, cur)) == cur exactly,
    * including null-to-value and value-to-null column transitions (the
    * delta marker is its own column, so a null delta VALUE still
    * overwrites).
    */
  def applyDelta(
      prev: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty)
    val d = delta.select((keyCols ++ ("change_type" +: valueCols)).map(col): _*)
      .withColumnsRenamed(
        valueCols.map(c => c -> s"__d_$c").toMap + ("change_type" -> "__d_change"))
    prev.select((keyCols ++ valueCols).map(col): _*)
      .join(d, keyCols, "full_outer")
      .filter(col("__d_change").isNull || col("__d_change") =!= "removed")
      .select(keyCols.map(col) ++ valueCols.map(c =>
        when(col("__d_change").isNotNull, col(s"__d_$c"))
          .otherwise(col(c)).as(c)): _*)
  }

  /** q125: the MERGE round trip over the q116 customer fixtures —
    * [[applyDelta]](old, [[snapshotDelta]](old, new)) materialized as
    * the next snapshot (which the round-trip law makes exactly equal to
    * the new snapshot; the oracle REPLAYS the join/apply mechanics, not
    * the law). Ordered output for the hash gate.
    */
  def customerApplyDelta(customer: DataFrame): DataFrame = {
    val oldSnap = customer.filter(col("c_custkey") % 97 =!= 0)
    val newSnap = customer.filter(col("c_custkey") % 89 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 31 === 0, col("c_acctbal") + 1)
          .otherwise(col("c_acctbal")))
    val vals = Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val delta = snapshotDelta(oldSnap, newSnap, Seq("c_custkey"), vals)
    applyDelta(oldSnap, delta, Seq("c_custkey"), vals)
      .orderBy("c_custkey")
  }

  /** DuckDB oracle for [[customerApplyDelta]] — the same two full-outer
    * joins and the same coalesce-by-marker projection, in SQL.
    */
  def customerApplyDeltaOracleSql(): String =
    s"""WITH oldsnap AS (
       |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
       |  FROM customer WHERE c_custkey % 97 <> 0),
       |newsnap AS (
       |  SELECT c_custkey, c_name, c_nationkey,
       |    CASE WHEN c_custkey % 31 = 0 THEN c_acctbal + 1 ELSE c_acctbal END
       |      AS c_acctbal,
       |    c_mktsegment
       |  FROM customer WHERE c_custkey % 89 <> 0),
       |delta AS (
       |  SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
       |    CASE
       |      WHEN o.c_custkey IS NULL THEN 'added'
       |      WHEN n.c_custkey IS NULL THEN 'removed'
       |      WHEN o.c_name IS DISTINCT FROM n.c_name
       |        OR o.c_nationkey IS DISTINCT FROM n.c_nationkey
       |        OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
       |        OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment THEN 'changed'
       |    END AS change_type,
       |    n.c_name, n.c_nationkey, n.c_acctbal, n.c_mktsegment
       |  FROM oldsnap o FULL OUTER JOIN newsnap n ON o.c_custkey = n.c_custkey),
       |d AS (SELECT * FROM delta WHERE change_type IS NOT NULL)
       |SELECT COALESCE(p.c_custkey, d.c_custkey) AS c_custkey,
       |  CASE WHEN d.change_type IS NOT NULL THEN d.c_name ELSE p.c_name END
       |    AS c_name,
       |  CASE WHEN d.change_type IS NOT NULL THEN d.c_nationkey ELSE p.c_nationkey END
       |    AS c_nationkey,
       |  CASE WHEN d.change_type IS NOT NULL THEN d.c_acctbal ELSE p.c_acctbal END
       |    AS c_acctbal,
       |  CASE WHEN d.change_type IS NOT NULL THEN d.c_mktsegment ELSE p.c_mktsegment END
       |    AS c_mktsegment
       |FROM oldsnap p FULL OUTER JOIN d ON p.c_custkey = d.c_custkey
       |WHERE d.change_type IS NULL OR d.change_type <> 'removed'
       |ORDER BY c_custkey""".stripMargin

  /** q116: [[snapshotDiff]] over two deterministic variants of the
    * customer snapshot — old drops custkey % 97 = 0 (→ added), new
    * drops custkey % 89 = 0 (→ removed) and bumps acctbal on
    * custkey % 31 = 0 (→ changed).
    */
  def customerDiff(customer: DataFrame): DataFrame = {
    val oldSnap = customer.filter(col("c_custkey") % 97 =!= 0)
    val newSnap = customer.filter(col("c_custkey") % 89 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 31 === 0, col("c_acctbal") + 1)
          .otherwise(col("c_acctbal")))
    snapshotDiff(oldSnap, newSnap,
      keyCols = Seq("c_custkey"),
      valueCols = Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
  }

  /** DuckDB oracle for [[customerDiff]]. */
  def customerDiffOracleSql(): String =
    s"""WITH oldsnap AS (
       |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
       |  FROM customer WHERE c_custkey % 97 <> 0),
       |newsnap AS (
       |  SELECT c_custkey, c_name, c_nationkey,
       |    CASE WHEN c_custkey % 31 = 0 THEN c_acctbal + 1 ELSE c_acctbal END
       |      AS c_acctbal,
       |    c_mktsegment
       |  FROM customer WHERE c_custkey % 89 <> 0)
       |SELECT c_custkey, change_type FROM (
       |  SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
       |    CASE
       |      WHEN o.c_custkey IS NULL THEN 'added'
       |      WHEN n.c_custkey IS NULL THEN 'removed'
       |      WHEN o.c_name IS DISTINCT FROM n.c_name
       |        OR o.c_nationkey IS DISTINCT FROM n.c_nationkey
       |        OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
       |        OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment THEN 'changed'
       |    END AS change_type
       |  FROM oldsnap o FULL OUTER JOIN newsnap n ON o.c_custkey = n.c_custkey)
       |WHERE change_type IS NOT NULL
       |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------------
  // SCD2 history materialization (q143): turn a keyed change stream
  // into the type-2 slowly-changing dimension — one row per state
  // EPISODE with [valid_from, valid_to) validity and an is_current
  // flag (Kimball's public dimensional-modeling pattern; the MERGE
  // target every warehouse maintains by hand).
  //
  // Shape, scale-first: both passes are ONE key-partitioned window over
  // the same (key, ts, seq) sort — Catalyst reuses the sort and the
  // exchange, so the whole materialization is one shuffle of the change
  // stream and two pipelined window evaluations. No global sort, no
  // join: episode detection is lag() ≠ current (nulls start an
  // episode), interval close is lead() over the surviving episode
  // heads. A hot key degrades to one task sorting that key's events —
  // the same bound as any per-entity sessionization.
  // -------------------------------------------------------------------

  /** SCD2 episodes of each user's event_type state over the events
    * change stream: (user_id, event_id, event_type, valid_from,
    * valid_to, is_current), where event_id is the surrogate version id
    * (the episode's opening event — also the output's tie-break for
    * same-timestamp changes). valid_to is the next episode's
    * valid_from, null while current (half-open intervals: a lookup ts
    * joins `valid_from <= ts < coalesce(valid_to, infinity)`).
    *
    * Dirty-data totality: rows with a null user_id are DROPPED, same as
    * the neighbouring event operators (sessionPaths, transitionCounts,
    * funnels) — on dirty data they would otherwise collapse into one
    * pseudo-user's episode chain, and the final user_id sort would
    * diverge between engines (Spark ASC NULLS FIRST vs DuckDB NULLS
    * LAST). A keyed dimension for an unknown key is meaningless.
    */
  def scd2FromEvents(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .filter(col("user_id").isNotNull &&
        col("event_type").isNotNull && col("ts").isNotNull)
      .select("user_id", "event_id", "event_type", "ts")
      .withColumn("__prev", lag(col("event_type"), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  /** DuckDB oracle for [[scd2FromEvents]] — identical episode/interval
    * windows. Spark evaluates lead() over the POST-filter episode rows
    * because the filter sits between the two withColumns; the SQL makes
    * that explicit with a CTE.
    */
  def scd2OracleSql(): String =
    """WITH ordered AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events
      |  WHERE user_id IS NOT NULL
      |    AND event_type IS NOT NULL AND ts IS NOT NULL),
      |episodes AS (
      |  SELECT user_id, event_id, event_type, ts FROM ordered
      |  WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_id, event_type, ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS valid_to,
      |  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
      |    AS is_current
      |FROM episodes
      |ORDER BY user_id, valid_from, event_id""".stripMargin
}
