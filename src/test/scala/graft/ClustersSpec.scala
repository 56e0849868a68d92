package graft

import org.apache.spark.sql.DataFrame
import graft.ops.Clusters

/** Clusters.connectedComponents: convergence over graphs deeper than the
  * usual near-dup diameter, the maxIter cap, and the reliable-checkpoint
  * mode (taken automatically when the SparkContext has a checkpoint dir).
  *
  * The checkpoint-dir test runs LAST in this suite: setCheckpointDir is
  * SparkContext-global and has no unset, so every CC run after it (in any
  * suite sharing the JVM) takes the reliable path — correctness-neutral,
  * exercised deliberately here.
  */
class ClustersSpec extends SparkSpec {

  /** Path graph 0-1-2-…-n: n edges, diameter n — min-label propagation
    * moves label 0 one hop per round, the worst case for round count.
    */
  private def pathGraph(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
  }

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("diameter-25 path graph fully converges given enough rounds") {
    val cc = labelsOf(Clusters.connectedComponents(pathGraph(25), maxIter = 30))
    assert(cc.size == 26)
    assert(cc.values.forall(_ == 0L), s"unconverged labels: ${cc.filter(_._2 != 0L)}")
  }

  test("maxIter caps the rounds: diameter-25 path is NOT converged at 5") {
    val cc = labelsOf(Clusters.connectedComponents(pathGraph(25), maxIter = 5))
    assert(cc.values.toSet.size > 1,
      "5 rounds converged a diameter-25 path — propagation is not 1 hop/round?")
    // partial progress is still monotone: every label is a valid ancestor
    cc.foreach { case (v, lbl) => assert(lbl <= v) }
  }

  test("reliable checkpoint mode: correct labels + checkpoint files written") {
    val dir = tmpDir("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    val cc = labelsOf(Clusters.connectedComponents(pathGraph(25), maxIter = 30))
    assert(cc.size == 26 && cc.values.forall(_ == 0L))
    // reliable checkpoints materialize as rdd-* directories under the dir
    import scala.jdk.CollectionConverters._
    val sawRdd = java.nio.file.Files.walk(dir).iterator().asScala
      .exists(_.getFileName.toString.startsWith("rdd-"))
    assert(sawRdd, s"no rdd-* checkpoint files under $dir")
  }
}
