package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication in embedding space (Abbas et al.
  * 2023, "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication"): cluster the corpus with a coarse k-means
  * quantizer, generate candidate pairs only WITHIN each cluster, group
  * transitively-similar vectors, keep one representative per group.
  *
  * This is the third member of the embedding-dedup family and fills the
  * recall/cost gap between its siblings:
  *   - q35/q64 ([[AnnLsh.nearDupPairs]] / [[Clusters.embedDupClusters]])
  *     bound candidates by RANDOM-HYPERPLANE buckets — recall depends on
  *     the hash family, cost on bucket occupancy;
  *   - q94 (this) bounds candidates by LEARNED density cells — the
  *     SemDeDup observation is that semantic duplicates land in the same
  *     k-means cell far more reliably than in the same LSH bucket, so a
  *     within-cell exact pass has near-perfect recall at
  *     O(Σ cell²) ≪ O(n²) cost.
  *
  * Quantizer: [[AnnIvf.initCentroids]] — the deterministic first-`nlist`
  * quantizer (q44's oracle-reproducible choice, 6-decimal score rounding,
  * min-id tie-break), so the DuckDB oracle replays the CLUSTERING too,
  * not just the verify: the whole operator is hash-compared, no
  * rows-only weakening. `trainIters > 0` swaps in Lloyd's-refined
  * centroids ([[AnnIvf.trainCentroids]]) — everything downstream is
  * unchanged (the production path; recall asserted in the spec).
  *
  * Scale shape: assignment is a pure map against the centroid literals
  * (argmax of nlist codegen'd dots — the corpus never shuffles to be
  * clustered); the within-cell self-join shuffles each side ONCE on
  * `list_id`, and every exact-cosine pair is cell-bounded — at 100 TB
  * pick nlist ∝ corpus/cell-budget (SemDeDup uses ~10⁵ cells for 10⁹
  * docs) so cells stay ~10⁴ vectors; a pathological hot cell is
  * AQE-skew-splittable because the join key is the cell id. Components
  * + keep flags reuse [[Clusters.connectedComponents]] (min-label
  * propagation, one labels-exchange per round).
  *
  * Cache lifetime: the assigned frame is persisted because the returned
  * lazy plan reads it three times (both join sides + the label join) —
  * caller-owned, the [[NearDup.containmentPairs]] discipline.
  */
object SemDedup {

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  /** (vec_id, list_id, cluster_id, keep) for every vector in a semantic
    * dup group: list_id = its k-means cell, cluster_id = min vec_id of
    * its transitive dup group (dup edge = within-cell cosine ≥
    * `threshold` at 4dp), keep = 1 iff it is that representative.
    * Singletons (no dup edge) are omitted — they are implicitly kept
    * (the q64 contract).
    */
  def semanticDedup(
      emb: DataFrame,
      nlist: Int = AnnIvf.NList,
      threshold: Double = 0.3,
      trainIters: Int = 0): DataFrame = {
    val cents: Seq[(Long, Array[Float])] =
      if (trainIters > 0) AnnIvf.trainCentroids(emb, nlist, trainIters)
      else AnnIvf.initCentroids(emb, nlist)
    if (cents.isEmpty)
      return emb.select(
        col("vec_id"), col("vec_id").as("list_id"),
        col("vec_id").as("cluster_id"), lit(1).as("keep")).limit(0)
    val sc = AnnIvf.scored(col("embedding"), cents)
    // same validity contract as q44: null vectors can neither cluster
    // nor pair (they would null-score every centroid and win the min-id
    // tie-break); norms computed once per vector, not per pair
    val assigned = emb.filter(col("embedding").isNotNull)
      .select(
        col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"),
        (-array_max(sc).getField("nc")).as("list_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = assigned
      .select(col("list_id"), col("vec_id").as("a"),
        col("embedding").as("va"), col("nrm").as("na"))
      .join(assigned
        .select(col("list_id"), col("vec_id").as("b"),
          col("embedding").as("vb"), col("nrm").as("nb")),
        Seq("list_id"))
      .filter(col("a") < col("b"))
      .filter(round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4)
        >= threshold)
      .select(col("a"), col("b"))
    val cc = Clusters.connectedComponents(pairs)
    assigned.select(col("vec_id"), col("list_id"))
      .join(cc.select(col("v").as("vec_id"), col("cluster_id")), Seq("vec_id"))
      .withColumn("keep", (col("vec_id") === col("cluster_id")).cast("int"))
      .orderBy("vec_id")
  }

  /** DuckDB oracle for [[semanticDedup]] (the `trainIters = 0` anchor):
    * q44's assignment CTE (first-nlist quantizer, 6dp scores, min-id
    * ties) + within-cell exact-cosine pairs + the q64 recursive
    * transitive closure.
    */
  def semanticDedupOracleSql(
      nlist: Int = AnnIvf.NList,
      threshold: Double = 0.3): String =
    s"""WITH RECURSIVE ex AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
       |    generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |cents AS (SELECT vec_id AS cid, x, i FROM ex WHERE vec_id < $nlist),
       |cnorm AS (SELECT cid, sqrt(sum(x * x)) AS nrm FROM cents GROUP BY 1),
       |scores AS (
       |  SELECT e.vec_id, c.cid, round(sum(e.x * c.x) / cn.nrm, 6) AS s
       |  FROM ex e JOIN cents c ON c.i = e.i JOIN cnorm cn ON cn.cid = c.cid
       |  GROUP BY e.vec_id, c.cid, cn.nrm),
       |assigned AS (
       |  SELECT vec_id, cid AS list_id FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
       |    FROM scores) WHERE rn = 1),
       |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY 1),
       |pairs AS (
       |  SELECT a.vec_id AS a, b.vec_id AS b
       |  FROM assigned a JOIN assigned b
       |    ON a.list_id = b.list_id AND a.vec_id < b.vec_id
       |  JOIN ex ea ON ea.vec_id = a.vec_id
       |  JOIN ex eb ON eb.vec_id = b.vec_id AND eb.i = ea.i
       |  JOIN norms na ON na.vec_id = a.vec_id
       |  JOIN norms nb ON nb.vec_id = b.vec_id
       |  GROUP BY 1, 2, na.nrm, nb.nrm
       |  HAVING round(sum(ea.x * eb.x) / (na.nrm * nb.nrm), 4) >= $threshold),
       |edges AS (
       |  SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
       |reach(v, r) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.v = e.b),
       |cc AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY 1)
       |SELECT cc.v AS vec_id, assigned.list_id, cc.cluster_id,
       |  CAST(cc.v = cc.cluster_id AS INTEGER) AS keep
       |FROM cc JOIN assigned ON assigned.vec_id = cc.v
       |ORDER BY vec_id""".stripMargin
}
