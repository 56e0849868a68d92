package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift audit between two periods of a fact — the data
  * contract a production pipeline checks before retraining on a new
  * window: has the VALUE DISTRIBUTION moved, not just the row count?
  * Metric: Population Stability Index (PSI), the published credit-risk
  * monitoring statistic — per bucket i,
  * psi_i = (p_cur_i − p_ref_i) · ln(p_cur_i / p_ref_i), always ≥ 0;
  * total > 0.1 is the conventional "investigate", > 0.25 "act".
  *
  * Determinism (cross-engine hash-compare): every share is one double
  * division of exact longs; the ln argument is formed as ONE division
  * of exact long PRODUCTS ((cc·nr)/(cr·nc)) so both engines feed ln the
  * same double; the contribution is quantized to integer millionths
  * with floor(x·1e6 + 0.5) — the q106/BM25 discipline that absorbs the
  * ≤ 1 ulp ln() divergence between libm implementations. PSI
  * contributions are non-negative, so the half-up floor never straddles
  * zero.
  *
  * Shape, scale-first: ONE scan → ONE |buckets|-row aggregate with
  * map-side conditional partials (both periods counted in the same
  * pass — the q132 one-aggregate audit shape); period totals ride a
  * 1-row broadcast scalar. Nothing corpus-scale shuffles: the shuffle
  * carries |buckets| rows of two longs.
  */
object Drift {

  /** Per-bucket PSI between the reference period (`dateCol` < `cut`)
    * and the current period (≥ `cut`) over fixed-width `bucketWidth`
    * buckets of `valueCol`. Output: (bucket, ref_cnt, cur_cnt, psi_q)
    * with psi_q = round(psi_i · 1e6) as a long, bucket asc. A bucket
    * empty in ONE period is where drift concentrates (new mass in
    * never-seen territory) — ln(0) is handled by the standard
    * half-count substitution: the share numerator is max(cnt, 0.5),
    * totals stay actual. Deterministic (0.5 is exact in binary), total,
    * and the signal survives instead of being filtered out.
    */
  def psiDrift(
      facts: DataFrame,
      valueCol: String,
      dateCol: String,
      cut: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0)
    val cutTs = lit(cut).cast("timestamp")
    val bucketed = facts
      .filter(col(valueCol).isNotNull && col(dateCol).isNotNull)
      .select(
        floor(col(valueCol) / bucketWidth).cast("long").as("bucket"),
        (col(dateCol) < cutTs).as("is_ref"))
    val counts = bucketed
      .groupBy("bucket")
      .agg(
        count(when(col("is_ref"), 1)).as("ref_cnt"),
        count(when(!col("is_ref"), 1)).as("cur_cnt"))
    psiFromCounts(counts)
  }

  /** The PSI arithmetic over a prepared (bucket, ref_cnt, cur_cnt)
    * frame — shared by the batch form above and the streaming gate
    * ([[graft.streaming.StreamingEtl.runDriftGate]]), so the two can
    * never diverge (spec-pinned bit-equal).
    *
    * Degenerate periods: when EITHER period is entirely empty (nr = 0
    * or nc = 0 — an empty micro-batch reaching the gate, or a reference
    * compared before any current rows), the shares are undefined and
    * the raw arithmetic would cast Infinity to Long.MaxValue. psi_q is
    * NULL in that case — an explicit "period empty" sentinel a consumer
    * can distinguish from any real score (real PSI is a finite long ≥
    * 0), and the oracle SQL carries the same CASE guard so the engines
    * agree on degenerate input too.
    */
  def psiFromCounts(counts: DataFrame, keyCol: String = "bucket"): DataFrame = {
    val totals = counts.agg(
      sum(col("ref_cnt")).as("nr"), sum(col("cur_cnt")).as("nc"))
    // half-count smoothing: a zero count enters shares and ln as 0.5
    // (exact in binary — deterministic on both engines)
    val ca = greatest(col("cur_cnt").cast("double"), lit(0.5))
    val ra = greatest(col("ref_cnt").cast("double"), lit(0.5))
    counts
      .crossJoin(broadcast(totals)) // 1-row scalar
      .select(col(keyCol), col("ref_cnt"), col("cur_cnt"),
        when(col("nr") > 0 && col("nc") > 0,
          floor(
            ((ca / col("nc")) - (ra / col("nr"))) *
              // products in double (counts are < 2^53, so the conversions
              // are exact and the chain stays correctly-rounded): a long
              // product would overflow at ~1e10-row periods
              log((ca * col("nr").cast("double")) /
                (ra * col("nc").cast("double"))) *
              lit(1000000.0) + lit(0.5)).cast("long")).as("psi_q"))
      .orderBy(keyCol)
  }

  /** Categorical twin of [[psiDrift]] (the more common monitoring ask —
    * the reference's own schema is mostly categorical: status, product
    * type, purpose — /root/reference/airflow/include/loan_spark_etl.py):
    * per-CATEGORY PSI between the two periods of `catCol`, identical
    * arithmetic via [[psiFromCounts]] so the numeric, categorical, and
    * streaming forms can never diverge. A category present in only one
    * period (the new-status / retired-status signal) is where drift
    * concentrates; the half-count smoothing keeps it in the signal.
    * Output: (category, ref_cnt, cur_cnt, psi_q), category asc.
    *
    * Same scale shape as the numeric form: ONE scan, one |categories|-row
    * aggregate with map-side conditional partials, totals a 1-row
    * broadcast.
    */
  def categoricalPsiDrift(
      facts: DataFrame,
      catCol: String,
      dateCol: String,
      cut: String): DataFrame = {
    val cutTs = lit(cut).cast("timestamp")
    val counts = facts
      .filter(col(catCol).isNotNull && col(dateCol).isNotNull)
      .select(col(catCol).as("category"), (col(dateCol) < cutTs).as("is_ref"))
      .groupBy("category")
      .agg(
        count(when(col("is_ref"), 1)).as("ref_cnt"),
        count(when(!col("is_ref"), 1)).as("cur_cnt"))
    psiFromCounts(counts, keyCol = "category")
  }

  /** DuckDB oracle for [[categoricalPsiDrift]] over the DIRTIED orders
    * fact used by q157: the current period's orderkey % 11 residue class
    * reports a NEVER-SEEN status 'X' (a new code shipped mid-stream —
    * the q147/q132 planted-violation discipline), so drift concentrates
    * in a category with ref_cnt = 0. Identical share/ln/quantization
    * arithmetic to [[ordersDriftOracleSql]].
    */
  def ordersCategoricalDriftOracleSql(cut: String = "1998-01-01"): String =
    s"""WITH o AS (
       |  SELECT o_orderdate,
       |    CASE WHEN o_orderkey % 11 = 0
       |           AND o_orderdate >= TIMESTAMP '$cut'
       |         THEN 'X' ELSE o_orderstatus END AS o_orderstatus
       |  FROM orders),
       |counts AS (
       |  SELECT o_orderstatus AS category,
       |    CAST(count(*) FILTER (WHERE o_orderdate < TIMESTAMP '$cut')
       |      AS BIGINT) AS ref_cnt,
       |    CAST(count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '$cut')
       |      AS BIGINT) AS cur_cnt
       |  FROM o
       |  WHERE o_orderstatus IS NOT NULL AND o_orderdate IS NOT NULL
       |  GROUP BY 1),
       |totals AS (
       |  SELECT sum(ref_cnt) AS nr, sum(cur_cnt) AS nc FROM counts),
       |smoothed AS (
       |  SELECT category, ref_cnt, cur_cnt,
       |    greatest(CAST(cur_cnt AS DOUBLE), 0.5) AS ca,
       |    greatest(CAST(ref_cnt AS DOUBLE), 0.5) AS ra
       |  FROM counts)
       |SELECT category, ref_cnt, cur_cnt,
       |  CASE WHEN nr > 0 AND nc > 0 THEN
       |  CAST(floor(
       |    ((ca / nc) - (ra / nr)) *
       |    ln((ca * CAST(nr AS DOUBLE)) / (ra * CAST(nc AS DOUBLE)))
       |    * 1000000.0 + 0.5)
       |    AS BIGINT) END AS psi_q
       |FROM smoothed, totals
       |ORDER BY category""".stripMargin

  /** Exact two-sample Kolmogorov–Smirnov drift statistic between the
    * two periods of `valueCol` — PSI's nonparametric companion: no
    * buckets, no smoothing, D = max over x of |F_ref(x) − F_cur(x)|,
    * the supremum deviation of the two empirical CDFs. Where PSI needs
    * a bucket width and concentrates on density shifts, KS is
    * distribution-free and catches location/shape shifts a coarse
    * bucketing can average away.
    *
    * Exactness at scale: the CDFs need a GLOBAL cumulative count in
    * value order — the single-task `ORDER BY` window hazard. This rides
    * [[Ranks.withGlobalCumSums]] (range partition + per-partition
    * subtotals + broadcast offsets — every task sums N/P rows) over the
    * per-distinct-value count frame, so the order is total by
    * construction and the op is exact at any corpus size.
    *
    * Determinism: the deviation is compared as EXACT LONGS —
    * |cum_ref·nc − cum_cur·nr| (counts < 2³¹ keep the product well
    * inside long range); only the final reported statistic divides once
    * and quantizes to integer millionths (the PSI discipline). Output:
    * ONE row (ks_q, at_value, nr, nc) — the statistic, the value where
    * the supremum is attained (min value on ties), and the period
    * sizes. Degenerate empty period → NULL ks_q sentinel (the
    * psiFromCounts contract).
    */
  def ksDrift(
      facts: DataFrame,
      valueCol: String,
      dateCol: String,
      cut: String): DataFrame = {
    val cutTs = lit(cut).cast("timestamp")
    val counts = facts
      .filter(col(valueCol).isNotNull && col(dateCol).isNotNull)
      .select(col(valueCol).as("v"), (col(dateCol) < cutTs).as("is_ref"))
      .groupBy("v")
      .agg(
        count(when(col("is_ref"), 1)).as("ref_cnt"),
        count(when(!col("is_ref"), 1)).as("cur_cnt"))
    ksFromCounts(counts)
  }

  /** The KS arithmetic over a prepared (v, ref_cnt, cur_cnt) frame —
    * shared by the batch form above and the streaming gate
    * ([[graft.streaming.StreamingEtl.runKsDriftGate]]), the
    * [[psiFromCounts]] shared-core discipline: the two forms can never
    * diverge. Output and degenerate-period contract as [[ksDrift]].
    */
  def ksFromCounts(counts: DataFrame): DataFrame = {
    val cum = Ranks.withGlobalCumSums(
      counts, Seq(col("v")),
      Seq("ref_cnt" -> "cum_ref", "cur_cnt" -> "cum_cur"))
    val totals = counts.agg(
      sum(col("ref_cnt")).as("nr"), sum(col("cur_cnt")).as("nc"))
    cum
      .crossJoin(broadcast(totals)) // 1-row scalar
      .select(col("v"), col("nr"), col("nc"),
        abs(col("cum_ref") * col("nc") - col("cum_cur") * col("nr"))
          .as("dev"))
      .orderBy(desc("dev"), asc("v"))
      .limit(1)
      .select(
        when(col("nr") > 0 && col("nc") > 0,
          floor(col("dev").cast("double") /
            (col("nr").cast("double") * col("nc").cast("double")) *
            lit(1000000.0) + lit(0.5)).cast("long")).as("ks_q"),
        col("v").as("at_value"), col("nr"), col("nc"))
  }

  /** DuckDB oracle for [[ksDrift]] over the q147 dirtied orders fact
    * (same planted current-period 1.5× shift): identical per-value
    * counts, window cumulative sums (total order by construction —
    * distinct values), exact-long deviation compare, and final
    * quantization.
    */
  def ordersKsDriftOracleSql(cut: String = "1998-01-01"): String =
    s"""WITH o AS (
       |  SELECT o_orderkey, o_orderdate,
       |    CASE WHEN o_orderkey % 7 = 0
       |           AND o_orderdate >= TIMESTAMP '$cut'
       |         THEN o_totalprice * 1.5 ELSE o_totalprice END
       |      AS o_totalprice
       |  FROM orders),
       |counts AS (
       |  SELECT o_totalprice AS v,
       |    CAST(count(*) FILTER (WHERE o_orderdate < TIMESTAMP '$cut')
       |      AS BIGINT) AS ref_cnt,
       |    CAST(count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '$cut')
       |      AS BIGINT) AS cur_cnt
       |  FROM o
       |  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
       |  GROUP BY 1),
       |cum AS (
       |  SELECT v,
       |    sum(ref_cnt) OVER (ORDER BY v
       |      ROWS UNBOUNDED PRECEDING) AS cum_ref,
       |    sum(cur_cnt) OVER (ORDER BY v
       |      ROWS UNBOUNDED PRECEDING) AS cum_cur
       |  FROM counts),
       |totals AS (
       |  SELECT sum(ref_cnt) AS nr, sum(cur_cnt) AS nc FROM counts),
       |dev AS (
       |  SELECT v, nr, nc,
       |    abs(cum_ref * nc - cum_cur * nr) AS dev
       |  FROM cum, totals
       |  ORDER BY dev DESC, v ASC LIMIT 1)
       |SELECT
       |  CASE WHEN nr > 0 AND nc > 0 THEN
       |    CAST(floor(CAST(dev AS DOUBLE) /
       |      (CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)) * 1000000.0 + 0.5)
       |      AS BIGINT) END AS ks_q,
       |  v AS at_value, CAST(nr AS BIGINT) AS nr, CAST(nc AS BIGINT) AS nc
       |FROM dev""".stripMargin

  /** Fixed-width bucket histogram of `valueCol` — the persisted
    * reference artifact the streaming gate compares batches against.
    * Output: (bucket, cnt).
    */
  def histogram(
      df: DataFrame, valueCol: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0)
    df.filter(col(valueCol).isNotNull)
      .groupBy(floor(col(valueCol) / bucketWidth).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** DuckDB oracle for [[psiDrift]] over the DIRTIED orders fact used
    * by q147 (see the query: clean uniform prices drift nowhere — the
    * current period's residue class gets a 1.5× price shift, the q132
    * planted-violation discipline). Identical bucket, share, and
    * quantization arithmetic.
    */
  def ordersDriftOracleSql(
      cut: String = "1998-01-01",
      bucketWidth: Double = 50000.0): String =
    s"""WITH o AS (
       |  SELECT o_orderkey, o_orderdate,
       |    CASE WHEN o_orderkey % 7 = 0
       |           AND o_orderdate >= TIMESTAMP '$cut'
       |         THEN o_totalprice * 1.5 ELSE o_totalprice END
       |      AS o_totalprice
       |  FROM orders),
       |bucketed AS (
       |  SELECT CAST(floor(o_totalprice / $bucketWidth) AS BIGINT) AS bucket,
       |    (o_orderdate < TIMESTAMP '$cut') AS is_ref
       |  FROM o WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL),
       |counts AS (
       |  SELECT bucket,
       |    CAST(count(*) FILTER (WHERE is_ref) AS BIGINT) AS ref_cnt,
       |    CAST(count(*) FILTER (WHERE NOT is_ref) AS BIGINT) AS cur_cnt
       |  FROM bucketed GROUP BY 1),
       |totals AS (
       |  SELECT sum(ref_cnt) AS nr, sum(cur_cnt) AS nc FROM counts),
       |smoothed AS (
       |  SELECT bucket, ref_cnt, cur_cnt,
       |    greatest(CAST(cur_cnt AS DOUBLE), 0.5) AS ca,
       |    greatest(CAST(ref_cnt AS DOUBLE), 0.5) AS ra
       |  FROM counts)
       |SELECT bucket, ref_cnt, cur_cnt,
       |  CASE WHEN nr > 0 AND nc > 0 THEN
       |  CAST(floor(
       |    ((ca / nc) - (ra / nr)) *
       |    ln((ca * CAST(nr AS DOUBLE)) / (ra * CAST(nc AS DOUBLE)))
       |    * 1000000.0 + 0.5)
       |    AS BIGINT) END AS psi_q
       |FROM smoothed, totals
       |ORDER BY bucket""".stripMargin
}
