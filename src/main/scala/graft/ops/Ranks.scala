package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe EXACT global ranking — the distributed replacement for
  * `row_number()/ntile(n) OVER (ORDER BY ...)` with no partition key,
  * which moves every row to ONE task and sorts there (the plan shape
  * q75/q80 ban per-stratum and q119 previously shipped globally).
  *
  * Reference scope: the reference's report stage ranks aggregates for
  * its top-N summary (`loan_spark_etl.py` aggregate ordering); this is
  * that ordering made exact at any scale.
  *
  * Two-pass construction (the classic distributed order-statistics
  * shape — TeraSort's partitioner + per-partition prefix offsets):
  *
  *   1. `repartitionByRange(P, order…)` range-partitions on the FULL
  *      sort key (explicit P: expression-only repartition is AQE-
  *      coalesced to one partition at small byte sizes — the r13 q97
  *      finding). Partition i holds a contiguous key range; within it a
  *      `row_number` over `spark_partition_id()` sorts ONLY that
  *      partition's rows — every task sorts N/P rows, never N.
  *   2. Per-partition row counts are collected (P longs — bounded by
  *      cluster width, the q79 broadcast-back discipline), prefix-summed
  *      into offsets on the driver, and broadcast-joined back:
  *      global rank = partition offset + local row_number. EXACT — not
  *      an approximation — because range partitioning makes partition i
  *      precede partition j on the sort key whenever i < j.
  *
  * The ranged frame is locally checkpointed between the counts action
  * and the ranked plan so both see the SAME range boundaries
  * (RangePartitioner samples its bounds; two independent computations
  * could disagree) — and so the ranked output is a fresh leaf relation
  * callers can freely self-join against their own lineage.
  *
  * Ties: callers must make the sort key total (append a unique
  * tie-break column, as SQL ntile determinism demands anyway) — range
  * partitioning splits equal keys deterministically, but cross-engine
  * rank parity on ties is only defined for total orders.
  */
object Ranks {

  /** `df` plus an exact 1-based global rank over `order` in column
    * `out` (long). Row order of the OUTPUT is unspecified (join-shuffled)
    * — callers sort or join as needed. `countOut`: optionally also emit
    * the TOTAL row count as a literal column — the ranking already
    * collected the per-partition counts whose sum is N, so a caller
    * that needs N (e.g. a median's middle-rank filter) gets it for free
    * instead of paying a second count() action over the frame.
    */
  def withGlobalRowNumber(
      df: DataFrame, order: Seq[Column], out: String,
      countOut: Option[String] = None): DataFrame =
    rank(df, order) { (ranked, total) =>
      val r = ranked.withColumnRenamed(RankCol, out)
      countOut.fold(r)(c => r.withColumn(c, lit(total)))
    }

  /** `df` plus an exact SQL `ntile(n)` tile over `order` in column
    * `out` (long, 1..n): first `N mod n` tiles hold `ceil(N/n)` rows,
    * the rest `floor(N/n)` — bit-identical to the single-partition
    * window form (RanksSpec pins it) and to DuckDB's ntile.
    */
  def withNtile(
      df: DataFrame, n: Int, order: Seq[Column], out: String): DataFrame = {
    require(n >= 1)
    rank(df, order) { (ranked, total) =>
      val base = total / n
      val rem = total % n
      val cut = rem * (base + 1)
      // integer-exact tile assignment from (rank, N): rank <= cut sits in
      // the (base+1)-sized tiles, the rest in base-sized ones (greatest
      // guards the never-taken else branch when N < n makes base 0)
      ranked
        .withColumn(out,
          when(col(RankCol) <= cut,
            expr(s"($RankCol + ${base}L) div ${base + 1}L"))
            .otherwise(expr(
              s"${rem}L + ($RankCol - ${cut}L + ${math.max(base, 1) - 1}L) " +
                s"div ${math.max(base, 1)}L")))
        .drop(RankCol)
    }
  }

  /** `df` plus an exact 1-based rank over `order` WITHIN each group of
    * `groupCols` (column `out`, long), and optionally each group's
    * total row count (`countOut`) — the grouped twin of
    * [[withGlobalRowNumber]], for the FEW-GROUPS × huge-rows shape
    * where `Window.partitionBy(group)` serializes each group into one
    * task (observed: q149's 3-group window left 3 of 32 threads
    * sorting 60M rows — a 6.4× scale cell at 10× data; this form
    * restores the every-task-sorts-N/P-rows bound; SCALE_CURVE carries
    * the measured cell).
    *
    * Construction: range-partition on (groupCols ++ order) — each
    * partition holds a contiguous slice of ONE OR A FEW groups — then
    * per-(partition, group) local row_number + driver prefix-summed
    * offsets per group, broadcast back. Driver traffic is the
    * per-(partition, group) counts: ≤ P + |groups| rows (contiguity:
    * a partition boundary can split a group at most once), the same
    * bounded-by-cluster-width contract as the global form's P longs —
    * callers with MILLIONS of groups should use the plain partitioned
    * window instead (it parallelizes fine there; this primitive exists
    * for the opposite regime).
    */
  def withGroupedRowNumber(
      df: DataFrame,
      groupCols: Seq[String],
      order: Seq[Column],
      out: String,
      countOut: Option[String] = None): DataFrame = {
    require(groupCols.nonEmpty && order.nonEmpty)
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val ranged0 = df
      .repartitionByRange(p, (groupCols.map(col) ++ order): _*)
      .withColumn(PidCol, spark_partition_id())
    val ranged = Checkpoints.materialize(ranged0)
    val countRows = ranged
      .groupBy((PidCol +: groupCols).map(col): _*)
      .agg(count(lit(1)).as("__graft_n"))
      .collect() // ≤ P + |groups| rows — the documented contract
    // per group in pid order: prefix-sum offsets; group totals ride along
    val byGroup = countRows
      .groupBy(r => groupCols.map(c => r.getAs[Any](c)).toList)
    val offRows = byGroup.iterator.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int](PidCol))
      val total = sorted.map(_.getAs[Long]("__graft_n")).sum
      var acc = 0L
      sorted.map { r =>
        val off = acc
        acc += r.getAs[Long]("__graft_n")
        org.apache.spark.sql.Row.fromSeq(
          r.getAs[Int](PidCol) +:
            groupCols.map(c => r.getAs[Any](c)) :+ off :+ total)
      }
    }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(
        PidCol, org.apache.spark.sql.types.IntegerType) +:
        groupCols.map(c => ranged.schema(c)) :+
        org.apache.spark.sql.types.StructField(
          "__graft_off", org.apache.spark.sql.types.LongType) :+
        org.apache.spark.sql.types.StructField(
          "__graft_tot", org.apache.spark.sql.types.LongType))
    val offDf = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema))
    val w = Window.partitionBy((PidCol +: groupCols).map(col): _*)
      .orderBy(order: _*)
    // join back NULL-SAFELY (<=>) on the group keys: a NULL group key is
    // a valid window partition (Window.partitionBy groups nulls
    // together), and a bare-equality join would silently DROP every
    // null-keyed row from the ranked output — the offsets side already
    // carries the null group (driver-side groupBy keys on Any, null
    // included), so <=> restores exact Window semantics
    val local = ranged
      .withColumn("__graft_local", row_number().over(w).cast("long"))
    val joinCond = ((local(PidCol) === offDf(PidCol)) +:
      groupCols.map(c => local(c) <=> offDf(c))).reduce(_ && _)
    val ranked = (PidCol +: groupCols)
      .foldLeft(local.join(offDf, joinCond))((d, c) => d.drop(offDf(c)))
      .withColumn(out, col("__graft_off") + col("__graft_local"))
    val withCount = countOut match {
      case Some(c) => ranked.withColumnRenamed("__graft_tot", c)
      case None => ranked.drop("__graft_tot")
    }
    withCount.drop(PidCol, "__graft_off", "__graft_local")
  }

  /** `df` plus exact global INCLUSIVE running totals of long `weights`
    * over the total order `order` — the distributed replacement for
    * `sum(w) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` with no
    * partition key (the same single-task hazard [[withGlobalRowNumber]]
    * retires for row_number). Each `(in, out)` pair emits the running
    * sum of `in` as `out`.
    *
    * Same two-pass shape: range partition on the sort key, per-partition
    * weight SUBTOTALS collected (P rows × |weights| longs — bounded by
    * cluster width), prefix-summed into per-partition starting offsets
    * on the driver, broadcast back, and added to a pid-partitioned local
    * running-sum window. EXACT for the same reason the rank is: range
    * partition i wholly precedes partition j on the key.
    *
    * Ties: make `order` total (unique tie-break) — at equal keys the
    * within-partition ROWS frame is order-dependent. (Callers that
    * pre-aggregate to distinct keys, e.g. [[Drift.ksDrift]]'s per-value
    * counts, are total by construction.)
    */
  def withGlobalCumSums(
      df: DataFrame,
      order: Seq[Column],
      weights: Seq[(String, String)]): DataFrame = {
    require(order.nonEmpty && weights.nonEmpty)
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val ranged0 = df.repartitionByRange(p, order: _*)
      .withColumn(PidCol, spark_partition_id())
    // checkpoint: pin the sampled range bounds between the subtotal
    // action and the windowed plan (see rank()); reliable under a dir
    val ranged = Checkpoints.materialize(ranged0)
    val sumCols = weights.zipWithIndex.map { case ((in, _), i) =>
      sum(col(in)).as(s"__graft_s$i")
    }
    val partials = ranged.groupBy(col(PidCol))
      .agg(sumCols.head, sumCols.tail: _*)
      .collect()
      .map(r => r.getInt(0) ->
        weights.indices.map(i => if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1)))
      .sortBy(_._1)
    val accs = Array.fill(weights.size)(0L)
    val offsets = partials.map { case (pid, subs) =>
      val row = org.apache.spark.sql.Row.fromSeq(
        pid +: accs.toIndexedSeq)
      weights.indices.foreach(i => accs(i) += subs(i))
      row
    }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(
        PidCol, org.apache.spark.sql.types.IntegerType) +:
        weights.indices.map(i => org.apache.spark.sql.types.StructField(
          s"__graft_off$i", org.apache.spark.sql.types.LongType)))
    val offDf = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(offsets: _*), offSchema))
    val w = Window.partitionBy(col(PidCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localled = weights.zipWithIndex.foldLeft(ranged) {
      case (d, ((in, _), i)) =>
        d.withColumn(s"__graft_l$i", sum(col(in)).over(w))
    }
    val joined = localled.join(offDf, PidCol)
    val withOuts = weights.zipWithIndex.foldLeft(joined) {
      case (d, ((_, out), i)) =>
        d.withColumn(out,
          coalesce(col(s"__graft_l$i"), lit(0L)) + col(s"__graft_off$i"))
    }
    weights.indices.foldLeft(withOuts)((d, i) =>
      d.drop(s"__graft_l$i", s"__graft_off$i")).drop(PidCol)
  }

  private val RankCol = "__graft_rank"
  private val PidCol = "__graft_pid"

  private def rank(df: DataFrame, order: Seq[Column])(
      finish: (DataFrame, Long) => DataFrame): DataFrame = {
    require(order.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    // checkpoint, not persist: (a) the sampled range bounds are PINNED —
    // the counts action and the ranked plan can never resample different
    // boundaries; (b) the ranked frame becomes a fresh leaf relation, so
    // callers can join rank outputs back onto their own lineage (a
    // shared non-leaf subtree carrying the nondeterministic pid column
    // fails DeduplicateRelations — observed INTERNAL_ERROR when ranking
    // a memory-sink snapshot). RELIABLE checkpoint when a dir is set
    // (executor loss mid-rank must not abort the job at cluster scale —
    // the Clusters r5 lesson); local internal-row checkpoint otherwise.
    val ranged0 = df.repartitionByRange(p, order: _*)
      .withColumn(PidCol, spark_partition_id())
    val ranged = Checkpoints.materialize(ranged0)
    val counts = ranged.groupBy(col(PidCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) =>
      val row = (pid, acc); acc += n; row
    }.toSeq
    val offDf = broadcast(offsets.toDF(PidCol, "__graft_off"))
    val w = Window.partitionBy(col(PidCol)).orderBy(order: _*)
    val ranked = ranged
      .withColumn("__graft_local", row_number().over(w).cast("long"))
      .join(offDf, PidCol)
      .withColumn(RankCol, col("__graft_off") + col("__graft_local"))
      .drop(PidCol, "__graft_off", "__graft_local")
    finish(ranked, acc)
  }
}
