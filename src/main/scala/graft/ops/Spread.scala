package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Layout-adaptive cluster-width respread for CPU-heavy map stages.
  *
  * A small corpus arrives as ONE scan split (a 13 MB parquet is a single
  * 128 MB-bound task), and everything Spark pipelines onto that scan —
  * per-row scoring maps, map-side candidate joins against broadcasts,
  * windows over their output — then runs on one core no matter how wide
  * the cluster is. `signatures` fixed this for MinHash with an
  * unconditional explicit-width repartition (r11/r13: the width must be
  * explicit because AQE's byte-targeted coalescing folds a small
  * expression-only repartition straight back to one partition).
  *
  * This helper is the CONDITIONAL form of that fix for operators whose
  * input is corpus-scale at 100 TB: it respreads only when the upstream
  * layout is actually narrower than the cluster, so a production-size
  * scan (already thousands of splits) pays NO extra exchange — the
  * shuffle exists exactly when the data is small enough for it to be
  * cheap. The partition count probe plans (but does not run) the frame.
  */
private[graft] object Spread {

  /** `df` hash-repartitioned on `key` to `defaultParallelism` when its
    * physical layout has fewer partitions than that; `df` unchanged
    * otherwise. The key must be deterministic (retried tasks must
    * reproduce the same row placement — SPARK-38388).
    *
    * The `.rdd` width probe is only planning-time work on SCAN-ROOTED
    * frames (filter/projection chains over a source scan). Under AQE,
    * converting a frame whose plan contains exchanges finalizes the
    * adaptive plan and eagerly MATERIALIZES its query stages — shuffle
    * maps run, broadcast builds run — at build time, with no exchange
    * reuse at the real action (the r18 ADVICE item; it was LIVE, not
    * latent: [[TrainPipe.fullPipeline]] feeds the persisted keeper frame
    * into [[QualityOps.repetitionCore]]'s widen, and the probe executed
    * the whole keeper-window subtree during query construction). So an
    * exchange-ful frame is returned UNCHANGED: its post-shuffle width is
    * runtime-chosen (AQE) and unknowable without executing, and a caller
    * that routes an exchanged frame here must guarantee cluster width
    * itself with an explicit-width repartition on the exchange it
    * already pays (fullPipeline now does exactly that).
    */
  def widen(df: DataFrame, key: Column): DataFrame = {
    val width = df.sparkSession.sparkContext.defaultParallelism
    val scanRooted = df.queryExecution.sparkPlan.find {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case _ => false
    }.isEmpty
    if (!scanRooted) df
    else if (df.rdd.getNumPartitions >= width) df
    else df.repartition(width, key)
  }
}
