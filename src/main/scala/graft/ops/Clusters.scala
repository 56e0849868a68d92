package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster formation: connected components over a near-dup
  * pair list — the step every dedup pipeline runs after candidate pairs
  * are verified (pairs say "a~b"; keep-one-per-cluster needs the
  * transitive closure).
  *
  * Algorithm: min-label propagation. Every node starts labeled with its
  * own id; each round a node takes the min of its label and its
  * neighbors' labels; converged when no label changes. That is the
  * standard distributed CC (GraphX/Pregel's connectedComponents does
  * exactly this) — O(cluster diameter) rounds, each ONE shuffle of
  * (node, label) pairs, no driver-side graph.
  *
  * Scale notes: labels are materialized and lineage-truncated each round
  * — iterative DataFrame loops otherwise stack lineage and replan from
  * scratch every iteration. Each round's labels are a persisted row RDD
  * behind a fresh LogicalRDD (Dataset.localCheckpoint offers no way to
  * release its blocks before context cleanup); when the SparkContext has
  * a checkpoint dir configured (or `reliable = Some(true)`), the RDD is
  * additionally RELIABLY checkpointed — files survive executor loss,
  * which on a real cluster would otherwise abort the whole iterative job
  * mid-round. Superseded rounds are released as soon as their successor
  * materializes — blocks unpersisted AND checkpoint files deleted — so
  * peak storage is two label frames regardless of round count (a
  * long-running per-batch caller never accumulates snapshots). Near-dup
  * clusters are tiny in practice (diameter 2-3), so rounds stay single
  * digits regardless of corpus size.
  */
object Clusters {

  /** (v, cluster_id) for every node in `pairs` (cols a, b); cluster_id =
    * min node id reachable through the pair graph. `reliable`: None =
    * use reliable checkpointing iff a checkpoint dir is set; Some(b)
    * forces the choice (Some(true) requires a checkpoint dir).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      reliable: Option[Boolean] = None): DataFrame = {
    val spark = pairs.sparkSession
    val useReliable =
      reliable.getOrElse(spark.sparkContext.getCheckpointDir.isDefined)
    // Materialize a round's labels and cut its lineage. Returns the
    // truncated frame plus a thunk releasing its storage once superseded.
    def truncate(df: DataFrame): (DataFrame, () => Unit) = {
      val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (useReliable) rdd.checkpoint() // materialized by the next action
      val release = () => {
        // checkpoint files are NOT context-cleaned by default
        // (spark.cleaner.referenceTracking.cleanCheckpoints defaults to
        // false) and are never swept at app end — delete them explicitly
        rdd.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        }
        rdd.unpersist(false)
        ()
      }
      (spark.createDataFrame(rdd, df.schema), release)
    }
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist()
    var cur = truncate(
      edges.select(col("a").as("v")).distinct().withColumn("lbl", col("v")))
    def labels = cur._1
    // labels only ever decrease, so the label-sum is strictly decreasing
    // until the fixpoint: comparing sums detects convergence with one
    // cheap aggregate instead of a join of consecutive rounds
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("lbl"), lit(0L))).head().getLong(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("v").as("b"), col("lbl").as("nlbl")), "b")
        .groupBy(col("a").as("v"))
        .agg(min("nlbl").as("minn"))
      val next = truncate(
        labels
          .join(neighborMin, Seq("v"), "left")
          .select(
            col("v"),
            least(col("lbl"), coalesce(col("minn"), col("lbl"))).as("lbl")))
      val nextSum = labelSum(next._1) // materializes `next` before freeing prev
      changed = nextSum != prevSum
      prevSum = nextSum
      cur._2() // release the superseded round's storage
      cur = next
      iter += 1
    }
    edges.unpersist()
    labels.select(col("v"), col("lbl").as("cluster_id"))
  }

  /** q64 body: clusters over the embedding near-dup pairs (q35), with
    * per-cluster sizes. Singleton vectors (no near-dup) are excluded —
    * the cluster table is exactly the nodes that appeared in a pair.
    */
  def embedDupClusters(emb: DataFrame): DataFrame = {
    val pairs = AnnLsh.nearDupPairs(emb)
      .select(col("vec_a").as("a"), col("vec_b").as("b"))
    val cc = connectedComponents(pairs)
    val sizes = cc.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "cluster_id")
      .select(col("v").as("vec_id"), col("cluster_id"), col("cluster_size"))
      .orderBy("vec_id")
  }

  /** DuckDB oracle: the same near-dup pairs (AnnLsh.nearDupOracleSql) fed
    * into a recursive transitive closure; cluster_id = min reachable id.
    * UNION (distinct) makes the recursion terminate on cycles.
    */
  def embedDupClustersOracleSql(): String = {
    val pairsSql = AnnLsh.nearDupOracleSql()
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |edges AS (
       |  SELECT vec_a AS a, vec_b AS b FROM pairs
       |  UNION
       |  SELECT vec_b, vec_a FROM pairs),
       |reach(v, r) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.v = e.b),
       |cc AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY 1),
       |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY 1)
       |SELECT cc.v AS vec_id, cc.cluster_id, sizes.cluster_size
       |FROM cc JOIN sizes USING (cluster_id)
       |ORDER BY vec_id""".stripMargin
  }
}
