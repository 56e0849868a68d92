package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared plumbing for the LSH-family candidate generators ([[NearDup]],
  * [[AnnLsh]], [[TextOps.simhashPairs]]).
  */
private[graft] object Lsh {

  /** Drop rows belonging to bucket-key groups larger than `cap` — the
    * hot-bucket guard for unsliced (full-corpus) candidate self-joins.
    *
    * A bucket of B members yields B(B-1)/2 candidate pairs, so one
    * degenerate bucket (boilerplate text, all-zero vectors) can dominate
    * the whole join. Capping trades recall for a hard output bound:
    * a pair dropped here is still found through any OTHER band/table the
    * two items share (MinHash: 32 bands, SimHash: 4 byte-bands, AnnLsh:
    * 16 tables), so only pairs whose every shared bucket is hot are lost.
    * Leave `cap` unset to keep exact LSH semantics and rely on AQE's
    * skew-join split to spread a hot bucket across reducers.
    *
    * One count-over-window pass: the window's hash partitioning on the
    * bucket keys is the same partitioning the candidate self-join needs,
    * so the guard adds no extra exchange ahead of a sort-merge join.
    */
  def guardHotBuckets(df: DataFrame, keys: Seq[String], cap: Option[Long]): DataFrame =
    cap.fold(df) { c =>
      val w = Window.partitionBy(keys.map(col): _*)
      df.withColumn("__bsz", count(lit(1)).over(w))
        .filter(col("__bsz") <= c)
        .drop("__bsz")
    }

  /** The sliced-vs-full candidate join shared by every LSH family member
    * (one definition so a future fix can't drift across call sites):
    * `Some(m)` broadcasts the bounded query side (`leftId < m`) — the
    * zero-shuffle bounded-batch shape; `None` is a hinted shuffle
    * sort-merge self-equi-join on the bucket keys — full corpus on both
    * sides, nothing broadcast regardless of size estimates, AQE
    * skew-splits hot buckets.
    */
  def candidateJoin(guarded: DataFrame, lhs: DataFrame, keys: Seq[String],
      leftId: String, sliceMax: Option[Long]): DataFrame =
    sliceMax match {
      case Some(m) => guarded.join(broadcast(lhs.filter(col(leftId) < m)), keys)
      case None    => guarded.hint("merge").join(lhs, keys)
    }

  /** Default raw-candidate budget for an UNGUARDED full-corpus candidate
    * self-join (see [[preflightFullCorpus]]). 50M raw candidates is ~16×
    * the whole sf0.1 corpus's guarded pair work and far beyond anything
    * an oracle query enumerates, while the q151 incident (a hot synthetic
    * vocabulary driving Σ C(bucket,2) into the billions, 57 s at sf0.1 —
    * a cluster-day at 100 TB) sails past it by orders of magnitude.
    */
  val DefaultPairBudget = 50000000L

  /** Exact number of raw candidate pairs the unguarded self-equi-join on
    * `keys` would enumerate: Σ over bucket-key groups of C(n, 2). One
    * keyed count (map-side partials) folded to a 1-row sum — a scan of
    * the band frame, orders of magnitude cheaper than the join it sizes.
    * n(n−1) is even, so the long division is exact.
    */
  def estimatedPairs(bk: DataFrame, keys: Seq[String]): Long =
    Option(
      bk.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .agg(sum(col("__n") * (col("__n") - 1) / 2).as("__pairs"))
        .head().get(0))
      .fold(0L)(_.asInstanceOf[Number].longValue())

  /** Pair-blowup preflight for a full-corpus (`sliceMax = None`) candidate
    * join with NO hot-bucket cap — the q151 lesson generalized: an
    * accidental unguarded run on a degenerate corpus is answer-size-
    * quadratic, and at 100 TB that is a cluster-day, not 57 seconds.
    * When `pairBudget` is set, one cheap pre-aggregate computes the EXACT
    * raw candidate count; over budget the call fails fast with the
    * estimate and the remediation (cap hot buckets, or raise/disable the
    * budget to knowingly accept the cost). `pairBudget = None` opts out.
    *
    * Callers skip the preflight entirely when a slice bound or a hot-
    * bucket cap is already in place — those paths carry their own bound.
    */
  def preflightFullCorpus(
      bk: DataFrame, keys: Seq[String], pairBudget: Option[Long]): Unit =
    pairBudget.foreach { budget =>
      val est = estimatedPairs(bk, keys)
      require(est <= budget,
        s"unguarded full-corpus candidate join would enumerate $est raw " +
          s"pairs (budget $budget): cap degenerate buckets " +
          "(hotBandMax/hotBucketMax), bound the query side (sliceMax), " +
          "or raise/disable pairBudget to accept the cost")
    }
}
