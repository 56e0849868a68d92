package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared plumbing for the LSH-family candidate generators ([[NearDup]],
  * [[AnnLsh]], [[TextOps.simhashPairs]]).
  */
private[ops] object Lsh {

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
}
