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
}
