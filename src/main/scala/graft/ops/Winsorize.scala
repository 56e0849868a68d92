package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winsorized aggregates (q124): clip a value column to per-group
  * [p05, p95] fences, then aggregate — the robust-statistics pass a
  * quality pipeline runs over heavy-tailed metrics (doc lengths, token
  * counts, prices) before feeding thresholds downstream.
  *
  * Two fence modes, the q67-vs-q40 pattern:
  *
  *   - EXACT (`approxFences = false`): Spark's `percentile`, which
  *     buffers every group value in one ObjectHashAggregate buffer —
  *     the correctness anchor the DuckDB oracle replays bit-for-bit
  *     (interpolated quantiles, 4dp-rounded before clipping), but an
  *     unbounded-state aggregate: at 100 TB a 3-group corpus would hold
  *     billions of doubles per buffer. Keep it for oracle-scale runs.
  *   - APPROX (`approxFences = true`): `approx_percentile` — both
  *     fences from ONE bounded Greenwald–Khanna sketch per group
  *     (O(accuracy · log n) state, mergeable map-side partials), the
  *     100 TB path. Rank error is ≤ n/accuracy per fence (the GK
  *     published bound, which Spark's implementation carries verbatim),
  *     so clipped-row counts differ from the exact form by at most that
  *     many rows per side — WinsorizeSpec asserts exactly this bound at
  *     a deliberately coarse accuracy, and that the default accuracy is
  *     rank-exact at test scale.
  *
  * Everything after the fences is identical and bounded: the |groups|-row
  * fence frame broadcasts back onto the rows, clipping is in-row
  * (least/greatest), and the final pass is ONE hash aggregate with
  * map-side partials.
  *
  * Output: (group, cnt, n_lo, n_hi, wins_sum) per group — total rows,
  * rows clipped at each fence, and the 2dp-rounded winsorized sum.
  */
object Winsorize {

  def winsorizedAgg(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pLo: Double = 0.05,
      pHi: Double = 0.95,
      approxFences: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"bad fence percentiles ($pLo, $pHi)")
    val fenceExpr =
      if (approxFences)
        expr(s"approx_percentile($valueCol, array(${pLo}D, ${pHi}D), $accuracy)")
      else expr(s"percentile($valueCol, array(${pLo}D, ${pHi}D))")
    val fences = df.groupBy(col(groupCol))
      .agg(fenceExpr.as("ps"))
      .select(col(groupCol),
        round(element_at(col("ps"), 1).cast("double"), 4).as("lo"),
        round(element_at(col("ps"), 2).cast("double"), 4).as("hi"))
    val x: Column = col(valueCol)
    df.join(broadcast(fences), groupCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("cnt"),
        count(when(x < col("lo"), 1)).as("n_lo"),
        count(when(x > col("hi"), 1)).as("n_hi"),
        round(sum(least(greatest(x, col("lo")), col("hi"))), 2)
          .as("wins_sum"))
      .orderBy(groupCol)
  }
}
