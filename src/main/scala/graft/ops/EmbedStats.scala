package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space statistics over labeled vector corpora — the
  * mislabel/anomaly screen a training-data pipeline runs before using
  * class labels as supervision (cf. confident-learning / centroid-
  * distance outlier screens): pool a centroid per class, score every
  * vector by its squared distance to its class centroid, surface the
  * global top outliers.
  *
  * Determinism discipline (the q90/BM25 rule — no float ever crosses a
  * shuffle):
  *
  *   - pooling quantizes each component to integer 1e-6 IN-ROW, so the
  *     per-(label, pos) aggregate sums exact longs (order-free); the
  *     centroid component is ONE long/long double division — correctly
  *     rounded, bit-identical in both engines;
  *   - the distance is an IN-ROW fold: each position's squared residual
  *     is quantized to integer 1e-9 and the fold sums longs, so the
  *     per-vector score is exact and the global ranking compares longs.
  *
  * Scale shape: the pooling aggregate is (label, pos)-keyed (map-side
  * partials collapse each task to ≤ |labels|·dim rows); the centroid
  * table is |labels|·dim — broadcast back; the scoring pass is a pure
  * map over the corpus; the top-N is a TakeOrderedAndProject. The
  * corpus is scanned twice and never shuffled.
  */
object EmbedStats {

  /** Global top-`topN` outliers by squared distance to the class
    * centroid: (vec_id, label, score). Vectors must carry exactly
    * `dim` components (ragged/null rows are excluded — they have no
    * well-defined residual against a dim-wide centroid).
    */
  def classOutliers(emb: DataFrame, dim: Int = 64, topN: Int = 50): DataFrame = {
    require(topN >= 1 && dim >= 1)
    val valid = emb
      .filter(col("embedding").isNotNull && col("label").isNotNull &&
        size(col("embedding")) === dim)
      .select(col("vec_id"), col("label"), col("embedding"))
    // quantize in-row, THEN aggregate: exact long sums per (label, pos)
    val cent = valid
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos"),
        expr("CAST(floor(CAST(col AS DOUBLE) * 1000000 + 0.5) AS BIGINT)").as("q"))
      .groupBy("label", "pos")
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      // ONE long/long double division per component — bit-identical
      .select(col("label"), col("pos"),
        (col("s") / (col("n") * lit(1000000.0d))).as("m"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), e -> e.m)")
        .as("cent"))
    // per-vector score: in-row fold of integer-quantized squared
    // residuals — order-free, exact, shuffle-safe
    val scored = valid
      .join(broadcast(cent), "label")
      .select(col("vec_id"), col("label"),
        expr("""aggregate(
                |  zip_with(embedding, cent,
                |    (x, c) -> CAST(floor((CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)
                |                         * 1000000000 + 0.5) AS BIGINT)),
                |  0L, (acc, e) -> acc + e)""".stripMargin).as("score_q"))
    scored
      .orderBy(desc("score_q"), asc("vec_id"))
      .limit(topN)
      .select(col("vec_id"), col("label"),
        round(col("score_q") / 1000000000.0d, 4).as("score"))
  }

  /** DuckDB oracle for [[classOutliers]] — the same quantize-then-sum
    * pooling and residual fold, posed relationally (per-(vec, pos)
    * residual rows summed as BIGINT — order-free, so the naive window
    * form is exact too).
    */
  def classOutliersOracleSql(dim: Int = 64, topN: Int = 50): String =
    s"""WITH ex AS (
       |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
       |    generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND label IS NOT NULL
       |    AND len(embedding) = $dim),
       |cent AS (
       |  SELECT label, i,
       |    sum(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS s,
       |    count(*) AS n
       |  FROM ex GROUP BY 1, 2),
       |mean AS (SELECT label, i, s / (n * 1000000.0) AS m FROM cent),
       |resid AS (
       |  SELECT e.vec_id, e.label,
       |    CAST(floor((e.x - mn.m) * (e.x - mn.m) * 1000000000 + 0.5) AS BIGINT) AS dq
       |  FROM ex e JOIN mean mn ON mn.label = e.label AND mn.i = e.i),
       |scores AS (
       |  SELECT vec_id, label, sum(dq) AS score_q
       |  FROM resid GROUP BY 1, 2)
       |SELECT vec_id, label, round(score_q / 1000000000.0, 4) AS score
       |FROM scores
       |ORDER BY score_q DESC, vec_id LIMIT $topN""".stripMargin
}
