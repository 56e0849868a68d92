package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{vecDotI8, vecQuantizeI8}

/** Int8-quantized similarity search: the memory-bound scale path beside
  * the exact float baseline (q24) and the pruning paths (LSH q29, IVF
  * q44).
  *
  * Reference scope: the reference pipeline
  * (/root/reference/airflow/include/loan_spark_etl.py) has no vector ops;
  * this extends the engine for the training-data workloads in the build
  * brief (similarity search over an embedding column), using the standard
  * public construction — symmetric per-vector scalar quantization as in
  * faiss's SQ8 / product-quantization literature (Jégou et al., PQ 2011).
  *
  * Why this matters at 100 TB: similarity search there is memory-bound,
  * not FLOP-bound. Quantizing 64-dim float32 embeddings to one byte per
  * dimension shrinks the resident corpus 4× — 4× more vectors per
  * executor before spill, 4× more query rows broadcastable under the same
  * `spark.sql.autoBroadcastJoinThreshold` — and the scoring loop becomes
  * an exact 64-bit integer dot ([[graft.functions.VecDotI8]]) that the
  * JIT vectorizes. Per-vector scales cancel in cosine, so ranking needs
  * no dequantization pass.
  *
  * Determinism: quantization is floor(x·scale + 0.5) in IEEE double
  * ([[graft.functions.QuantizeI8]]), dots/norms are exact integers, and
  * the only floats are the final per-pair division + round(4) — the
  * catalog's q61/q77 discipline, replayed verbatim by the DuckDB oracle.
  */
object Quantize {

  /** Top-`k` neighbors by int8-quantized cosine for query vectors
    * `vec_id < queryMax`, ranked on the rounded similarity with
    * neighbor_id tie-break (stable across engines).
    *
    * Plan shape matches q24's exact baseline — quantize+norm each side
    * once, broadcast the query sliver — so the A/B against q24 isolates
    * the quantization effect; recall vs the exact top-k is pinned in
    * QuantizeSpec.
    */
  def annTopKQuantized(emb: DataFrame, queryMax: Long = 5L, k: Int = 5): DataFrame = {
    // quantized vector + its integer self-dot norm ride together: one
    // projection per side, never recomputed per pair
    // nrm = 0 (the all-zero embedding) would make qcosine 0/0 = NaN,
    // which Spark orders ABOVE every real similarity in the desc window
    // while DuckDB's division yields NULL — so zero vectors are excluded
    // from both sides before any pair forms (they carry no direction to
    // rank by). QuantizeSpec pins the zero-vector case.
    val qz = emb.select(
      col("vec_id"),
      vecQuantizeI8(col("embedding")).as("qv"))
      .withColumn("nrm", sqrt(vecDotI8(col("qv"), col("qv")).cast("double")))
      .filter(col("nrm") > 0)
    val q = qz.filter(col("vec_id") < queryMax)
      .select(col("vec_id").as("query_id"), col("qv").as("qq"), col("nrm").as("qn"))
    val c = qz.select(col("vec_id").as("neighbor_id"), col("qv").as("nv"), col("nrm").as("nn"))
    val sims = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(
          vecDotI8(col("qq"), col("nv")).cast("double") / (col("qn") * col("nn")),
          4).as("qcosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("qcosine"), asc("neighbor_id"))
    sims
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }

  /** DuckDB replay of [[annTopKQuantized]]: the same quantization
    * arithmetic — per-vector max|x| scale, floor(v + 0.5) to BIGINT,
    * exact integer dots/norms — in plain SQL.
    *
    * Scope: the arithmetic replay assumes null-free, finite embeddings
    * (what the testdata ships). Spark-side null/NaN discipline — a null
    * or non-finite ELEMENT nulls the whole quantized vector, and nulled
    * or all-zero vectors are filtered out before pairing (nrm > 0) — is
    * pinned by QuantizeSpec instead: the unnest
    * CTE here would sum over the remaining dimensions rather than null
    * the vector, so dirty corpora are the spec's job, not the oracle's.
    */
  def oracleSql(queryMax: Long = 5L, k: Int = 5): String =
    s"""WITH ex AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
       |    generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |mx AS (SELECT vec_id, max(abs(x)) AS maxabs FROM ex GROUP BY 1),
       |qx AS (
       |  SELECT e.vec_id, e.i,
       |    CASE WHEN m.maxabs = 0 THEN 0
       |         ELSE CAST(floor(e.x * (127.0 / m.maxabs) + 0.5) AS BIGINT)
       |    END AS q
       |  FROM ex e JOIN mx m ON m.vec_id = e.vec_id),
       |norms AS (
       |  SELECT vec_id, sqrt(CAST(sum(q * q) AS DOUBLE)) AS nrm
       |  FROM qx GROUP BY 1),
       |sims AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    round(CAST(sum(a.q * b.q) AS DOUBLE) / (na.nrm * nb.nrm), 4) AS qcosine
       |  FROM qx a
       |  JOIN qx b ON a.i = b.i AND a.vec_id < $queryMax AND a.vec_id <> b.vec_id
       |  JOIN norms na ON na.vec_id = a.vec_id
       |  JOIN norms nb ON nb.vec_id = b.vec_id
       |  GROUP BY 1, 2, na.nrm, nb.nrm)
       |SELECT query_id, neighbor_id, qcosine, rnk FROM (
       |  SELECT query_id, neighbor_id, qcosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY qcosine DESC, neighbor_id) AS rnk
       |  FROM sims) WHERE rnk <= $k
       |ORDER BY query_id, rnk""".stripMargin
}
