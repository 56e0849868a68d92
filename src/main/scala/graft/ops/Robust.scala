package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust (median/MAD) outlier screening — the anomaly detector a data
  * pipeline runs over value columns where mean/stddev z-scores are
  * themselves corrupted by the outliers they hunt (the classic robust-
  * statistics argument: median and MAD have a 50% breakdown point,
  * mean/stddev have 0%). Flag rows whose absolute deviation from the
  * median exceeds k · MAD (median absolute deviation) — Hampel's
  * published identifier, the boxplot's robust cousin.
  *
  * Reference scope: the reference's aggregate stage publishes min/max/
  * mean summaries (`loan_spark_etl.py` aggregate stage); a robust
  * outlier screen is the audit a production pipeline adds on top.
  *
  * Determinism: the median is EXACT via the [[Ranks]] two-pass global
  * ranking (never a single-partition window), computed as the mean of
  * the one or two middle ranks — `(a + b) / 2` with one double add and
  * one divide, an arithmetic chain DuckDB replays bit-for-bit (the
  * oracle ranks the same way rather than calling `median()`, whose
  * interpolation `a + (b-a)/2` is NOT the same float). Deviations,
  * the MAD, and the `dev > k·MAD` comparison are raw double arithmetic
  * on both engines — no rounding anywhere.
  *
  * Shape, scale-first: two [[Ranks]] passes (each: range partition on
  * the sort key + per-partition row_number + broadcast offsets — every
  * task sorts N/P rows) + two 1-row scalar broadcasts; the flag filter
  * is one map-side pass. Exactness at 100 TB costs those two sorted
  * passes — the `approx = true` twin collapses both medians into ONE
  * `approx_percentile` (GK sketch, bounded state) scan for the
  * screening-at-scale path; RobustSpec pins its flag set against the
  * exact form within the sketch's rank-error bound (the q124/q67
  * discipline: exact form anchors the oracle, sketch form documents
  * the scale path).
  */
object Robust {

  /** Rows of `df` whose `abs(value − median)` exceeds `k` · MAD:
    * (keyCol, valueCol, dev), ordered by dev desc. `keyCol` must be a
    * unique tie-break key. Exact by default; `approx = true` swaps both
    * medians for one bounded-state `approx_percentile` pass.
    */
  def madOutliers(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      k: Double = 3.0,
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(k > 0)
    val base = df.select(col(keyCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
    val medFrame =
      if (approx)
        base.agg(percentile_approx(col(valueCol), lit(0.5), lit(accuracy)).as("med"))
      else exactMedian(base, valueCol, keyCol)
    val devs = base
      .crossJoin(broadcast(medFrame)) // 1-row scalar
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val madFrame =
      if (approx)
        devs.agg(percentile_approx(col("dev"), lit(0.5), lit(accuracy)).as("mad"))
      else exactMedian(devs.select(col(keyCol), col("dev")), "dev", keyCol)
        .withColumnRenamed("med", "mad")
    devs
      .crossJoin(broadcast(madFrame)) // 1-row scalar
      .filter(col("dev") > lit(k) * col("mad"))
      .select(col(keyCol), col(valueCol), col("dev"))
      .orderBy(desc("dev"), col(keyCol))
  }

  /** Exact global median of `valueCol` as a 1-row frame (column `med`):
    * mean of the middle one/two ranks of the [[Ranks]] global ranking
    * ((N+1)/2 and N/2+1 — equal when N is odd).
    */
  private def exactMedian(
      df: DataFrame, valueCol: String, tieCol: String): DataFrame = {
    // total row count rides out of the ranking as a literal column
    // (Ranks already collected the per-partition counts whose sum is N)
    // — no second count() action over the checkpointed frame. n = 0
    // flows through: the rank filter matches nothing, avg yields one
    // null-med row, and every downstream dev/flag is null-filtered —
    // the whole operator is total on empty input (EmptyInputSpec gate)
    Ranks.withGlobalRowNumber(
      df, Seq(asc(valueCol), asc(tieCol)), "__rk", countOut = Some("__n"))
      .filter(expr("__rk = (__n + 1) div 2 OR __rk = __n div 2 + 1"))
      .agg(avg(col(valueCol)).as("med"))
  }

  /** EXACT grouped percentiles with BOUNDED memory (q149) — the scale
    * twin of q40's `percentile(...)`: that aggregate buffers every
    * group value in ONE ObjectHashAggregate buffer (billions of doubles
    * per group at 100 TB — the documented q40/q124 hazard, answered so
    * far only by q67's GK sketch). Here each group's quantiles come
    * from a group-PARTITIONED rank/count window — sort-based, spillable,
    * no whole-group array ever materializes — plus the same linear
    * interpolation Spark's `percentile` and DuckDB's `quantile_cont`
    * both publish: pos = (n−1)·p, v = lo + (hi − lo)·(pos − ⌊pos⌋).
    * RobustSpec pins bit-equality with the `percentile()` form, so this
    * IS q40's answer, just with a plan that survives group skew.
    *
    * Output: (groupCol, p, v) with v rounded to 4dp (the q40 contract),
    * ordered by (group, p). `ps` become plan literals in a ≤|ps|-row
    * broadcast; the only corpus-size work is the one partitioned sort.
    */
  def groupedPercentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCols: Seq[String],
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    val spark = df.sparkSession
    import spark.implicits._
    val order = (col(valueCol) +: tieCols.map(col)).map(_.asc)
    // grouped two-pass ranking (NOT Window.partitionBy(group)): with few
    // groups a group-partitioned window serializes each group into one
    // task — 3 of 32 threads sorting at q149's shape. The range-
    // partitioned form sorts N/P rows per task whatever |groups| is.
    val ranked = Ranks.withGroupedRowNumber(
      df.filter(col(valueCol).isNotNull)
        .select((groupCol +: valueCol +: tieCols).distinct.map(col): _*),
      Seq(groupCol), order, "rk", countOut = Some("n"))
    val psDf = ps.toDF("p")
    val rlo = (floor((col("n") - 1) * col("p")) + 1).cast("long")
    val rhi = least(rlo + 1, col("n"))
    ranked
      .join(broadcast(psDf), col("rk") === rlo || col("rk") === rhi)
      .withColumn("rlo", rlo)
      .groupBy(col(groupCol), col("p"))
      .agg(
        max(col("n")).as("n"),
        min(when(col("rk") === col("rlo"), col(valueCol))).as("lo"),
        coalesce(
          min(when(col("rk") === col("rlo") + 1, col(valueCol))),
          min(when(col("rk") === col("rlo"), col(valueCol)))).as("hi"))
      .select(col(groupCol), col("p"),
        round(
          col("lo") + (col("hi") - col("lo")) *
            ((col("n") - 1) * col("p") - floor((col("n") - 1) * col("p"))),
          4).as("v"))
      .orderBy(groupCol, "p")
  }

  /** DuckDB oracle for [[groupedPercentiles]] over lineitem — the
    * INDEPENDENT formulation (`quantile_cont`, which shares the
    * published interpolation), one SELECT per quantile.
    */
  def lineitemPercentilesOracleSql(
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75)): String =
    ps.map(p =>
      s"""SELECT l_returnflag, CAST($p AS DOUBLE) AS p,
         |  round(quantile_cont(l_extendedprice, $p), 4) AS v
         |FROM lineitem GROUP BY 1""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY l_returnflag, p")

  /** DuckDB oracle for the exact [[madOutliers]] over the DIRTIED
    * orders fact (see q144: clean uniform prices put every deviation
    * under 3·MAD — prime-residue planted outliers make the screen
    * non-vacuous, the q132 discipline) — the same rank-the-middle
    * median on both passes, never `median()` (its even-count
    * interpolation is a different float chain).
    */
  def ordersOutliersOracleSql(k: Double = 3.0): String =
    s"""WITH o AS (
       |  SELECT o_orderkey,
       |    CASE WHEN o_orderkey % 1009 = 0 THEN o_totalprice * 50.0
       |         WHEN o_orderkey % 1013 = 0 THEN o_totalprice * -10.0
       |         ELSE o_totalprice END AS o_totalprice
       |  FROM orders),
       |ranked AS (
       |  SELECT o_orderkey, o_totalprice,
       |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rk,
       |    count(*) OVER () AS n
       |  FROM o WHERE o_totalprice IS NOT NULL),
       |med AS (
       |  SELECT avg(o_totalprice) AS m FROM ranked
       |  WHERE rk = (n + 1) // 2 OR rk = n // 2 + 1),
       |devs AS (
       |  SELECT o_orderkey, o_totalprice,
       |    abs(o_totalprice - (SELECT m FROM med)) AS dev
       |  FROM o WHERE o_totalprice IS NOT NULL),
       |dranked AS (
       |  SELECT dev, row_number() OVER (ORDER BY dev, o_orderkey) AS rk,
       |    count(*) OVER () AS n
       |  FROM devs),
       |mad AS (
       |  SELECT avg(dev) AS m FROM dranked
       |  WHERE rk = (n + 1) // 2 OR rk = n // 2 + 1)
       |SELECT o_orderkey, o_totalprice, dev FROM devs
       |WHERE dev > $k * (SELECT m FROM mad)
       |ORDER BY dev DESC, o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // WEIGHTED percentiles (q162): "what document length covers p% of the
  // TOKENS" — the mixing question a training-data pipeline actually
  // asks (an unweighted length percentile over-counts short docs; the
  // budget is in tokens, not documents). The weighted p-quantile is the
  // smallest value v whose cumulative weight reaches p · W — exact at
  // any scale via the distributed cumulative sum
  // ([[Ranks.withGlobalCumSums]]: range partition + broadcast prefix
  // offsets — never a single-task ORDER BY window).
  //
  // Determinism: the reach test is EXACT INTEGERS — cum · 100 ≥ p · W
  // with p in whole percents — so there is no float boundary for the
  // engines to disagree on; both sides then take min(v) per p.
  // -------------------------------------------------------------------

  /** Exact weighted percentiles of `valueCol` under `weightCol`:
    * (p, value, cum_weight, total_weight) for each whole-percent p in
    * `ps`, p asc — value = the smallest v with cumWeight(v) ≥ p·W/100.
    * Rows with null value/weight or weight ≤ 0 are excluded (a zero
    * weight can't move the quantile; a negative one is dirty data).
    */
  def weightedPercentiles(
      df: DataFrame,
      valueCol: String,
      weightCol: String,
      ps: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100))
    val perValue = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .groupBy(col(valueCol).as("v"))
      .agg(sum(col(weightCol)).cast("long").as("w"))
    val cum = Ranks.withGlobalCumSums(
      perValue, Seq(col("v")), Seq("w" -> "cum_w"))
    val totals = perValue.agg(sum(col("w")).as("tw"))
    val pTable = broadcast(
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(
          ps.sorted.map(p => org.apache.spark.sql.Row(p.toLong)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            "p", org.apache.spark.sql.types.LongType)))))
    cum
      .crossJoin(broadcast(totals)) // 1-row scalar
      .join(pTable, col("cum_w") * 100 >= col("p") * col("tw")) // ≤|ps| matches/row
      .groupBy(col("p"))
      // tw is a constant riding every row of the cross join — carry it
      // through the groupBy as max() instead of re-aggregating perValue a
      // second time (the totals frame is one extra corpus scan otherwise)
      .agg(min(col("v")).as("value"), max(col("tw")).as("total_weight"))
      .select(col("p"), col("value"), col("total_weight"))
      .orderBy("p")
  }

  /** DuckDB oracle for [[weightedPercentiles]] over documents with
    * value = n_chars and weight = whitespace token count — identical
    * per-value aggregation, window cumsum, and integer reach test.
    */
  def documentsWeightedPercentilesOracleSql(
      ps: Seq[Int] = Seq(50, 90, 99)): String = {
    val pList = ps.sorted.mkString(", ")
    s"""WITH w AS (
       |  SELECT n_chars AS v,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS wt
       |  FROM documents
       |  WHERE n_chars IS NOT NULL),
       |pv AS (
       |  SELECT v, CAST(sum(wt) AS BIGINT) AS w FROM w
       |  WHERE wt > 0 GROUP BY 1),
       |cum AS (
       |  SELECT v,
       |    sum(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_w
       |  FROM pv),
       |totals AS (SELECT sum(w) AS tw FROM pv),
       |probes AS (SELECT unnest([$pList])::BIGINT AS p)
       |SELECT p, min(v) AS value,
       |  (SELECT CAST(tw AS BIGINT) FROM totals) AS total_weight
       |FROM cum, totals, probes
       |WHERE cum_w * 100 >= p * tw
       |GROUP BY p
       |ORDER BY p""".stripMargin
  }
}
