package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persisted TOKENIZER store — the train-once/apply-everywhere loop
  * (q163/q164) made durable with the same versioned-manifest protocol
  * as the other four stores ([[StoreManifest]]): a trained merge table
  * is published as an immutable data dir plus one atomic manifest
  * rename, so every job on the cluster tokenizes with EXACTLY the same
  * ranks, a retrain is a new version (old snapshots keep serving until
  * vacuum), and `mergesAt` reproduces any historical segmentation
  * bit-for-bit — the "which tokenizer was this budget denominated in?"
  * question a real pipeline must be able to answer.
  *
  * The merge table is tiny (one row per learned merge), so reads
  * collect it to the driver and apply it as literals — the same
  * broadcast-as-plan-literal shape [[TextOps.bpeEncodeWords]] uses.
  * Each version's component list REPLACES the previous (a tokenizer is
  * a whole artifact, not an append log).
  */
object TokenizerStore {

  private val Component = "merges"

  /** Train on `docs` ([[TextOps.bpeMerges]]) and publish the learned
    * table as the store's next version. Returns the published version.
    * A concurrent writer racing to the same version is rejected by the
    * manifest's exists-check — last-writer-loses, never a clobber. The
    * data dir is ATTEMPT-UNIQUE (name carries a random tag), so two
    * racers computing the same `next` write disjoint dirs and the
    * loser can never clobber or interleave with the dir the winner's
    * published manifest references (the immutability invariant
    * [[StoreManifest]] relies on); the loser's orphan dir is
    * unreferenced by every manifest and swept by the next `vacuum`.
    */
  def trainAndPublish(
      spark: SparkSession,
      dir: String,
      docs: org.apache.spark.sql.DataFrame,
      nMerges: Int,
      minCount: Long = 2L): Long = {
    val learned = TextOps.bpeMerges(docs, nMerges, minCount)
    val next = StoreManifest.currentSnapshot(spark, dir)
      .map(_.version + 1L).getOrElse(1L)
    val attempt = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"${StoreManifest.componentDir(Component, next)}-$attempt"
    import spark.implicits._
    learned.toDF("step", "left", "right", "cnt")
      .coalesce(1) // one row per merge: a single small file per version
      .write.parquet(s"$dir/$dataDir") // errorifexists: the dir is ours alone
    StoreManifest.publish(spark, dir,
      StoreManifest.Snapshot(next, -1L, Map(Component -> Seq(dataDir))))
    next
  }

  /** The merge table of snapshot `version`, in rank order — feed it to
    * [[TextOps.bpeTokenCounts]] / [[TrainPipe.budgetSample]](merges=…).
    */
  def mergesAt(spark: SparkSession, dir: String, version: Long): Seq[(String, String)] =
    readMerges(spark, dir, StoreManifest.snapshotAt(spark, dir, version))

  /** The currently-serving merge table, in rank order; empty if the
    * store has never published.
    */
  def currentMerges(spark: SparkSession, dir: String): Seq[(String, String)] =
    StoreManifest.currentSnapshot(spark, dir)
      .map(readMerges(spark, dir, _)).getOrElse(Seq.empty)

  private def readMerges(
      spark: SparkSession, dir: String,
      snap: StoreManifest.Snapshot): Seq[(String, String)] =
    StoreManifest.readComponent(spark, dir, snap, Component,
      Some("step INT, left STRING, right STRING, cnt LONG"))
      .map(_.orderBy(asc("step")) // rank order IS the apply order
        .collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)
      .getOrElse(Seq.empty)
}
