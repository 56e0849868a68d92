package graft.ops

import org.apache.spark.sql.DataFrame

/** One definition of the dir-aware materialization every multi-pass
  * consumer uses, so the reliability contract can't drift across call
  * sites (the r16 sweep fixed Graph/AnnIvf but missed Multimodal/
  * Retrieval/bpeMerges — exactly the drift a shared helper prevents).
  */
private[graft] object Checkpoints {

  /** Materialize `df` once and cut its lineage: RELIABLE `checkpoint()`
    * when a checkpoint dir is set — a local checkpoint's blocks die with
    * their executor, aborting the multi-pass consumer at cluster scale
    * (the Clusters r5 lesson, stated at [[Ranks]]) — and
    * `localCheckpoint()` otherwise (tests and ad-hoc shells with no dir,
    * where the single JVM owns every block anyway). Either way the frame
    * becomes a fresh leaf relation whose blocks are reference-tracked
    * away when dropped, unlike a bare un-unpersisted `persist` that pins
    * executor storage across every catalog run of a long-lived session
    * (the r14 advisory).
    */
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
