package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-engine text classification: a multinomial Naive Bayes classifier
  * trained and applied as ONE lineage — the shape of the fastText-style
  * linear classifiers every large-scale corpus pipeline runs for
  * language-ID, domain routing, and model-based quality scoring
  * (CCNet/LLaMA's fasttext lang filter, GPT-3's WebText-quality LR).
  * Training IS aggregation for NB — per-class token counts — so the
  * whole fit+predict is expressible as joins/aggregates with no
  * iterative driver loop, and (with the q90 integer-quantization
  * discipline) is exactly reproducible cross-engine: the oracle replays
  * TRAINING as well as inference, bit-for-bit.
  *
  * Model: add-one-smoothed multinomial NB over whitespace tokens.
  *   score(d, l) = q_prior(l) + Σ_{tok ∈ d} q(tok, l)
  *   q(tok, l)  = floor((ln(c(l,tok)+1) − ln(N_l + V)) · 10⁴ + 0.5)
  *   q_prior(l) = floor((ln(docs_l) − ln(docs_total)) · 10⁴ + 0.5)
  * with c over token OCCURRENCES per class, N_l the class token total,
  * V the corpus vocabulary. All aggregation is over exact longs; floats
  * live only in per-row ln folds of exact integers (the q90/q95
  * discipline, same accepted ulp-at-a-boundary risk). Prediction =
  * max score, ties to the lexicographically smallest label.
  *
  * Here the classifier is trained on the corpus's OWN labels and
  * applied back to it (the q90 "the corpus is its own model" closure —
  * no external model file); splitting train/apply is a filter on the
  * training input and changes nothing downstream.
  *
  * Scale shape: the model is (label, token)-keyed count aggregates with
  * map-side partial combine (hot tokens fold before the shuffle); the
  * dense (token × label) score grid — vocabulary-bounded, the q77 top-V
  * cap is the swap if vocabulary is unbounded — joins the token stream
  * on `tok` (label count tiny ⇒ grid ~ vocabulary-sized, broadcast);
  * per-(doc, label) sums are keyed by doc_id so no token hot-keys them;
  * the final argmax window partitions by doc_id (|labels| rows each).
  * No float crosses a shuffle; no driver-side training loop.
  */
object Classify {

  /** (doc_id, label, pred, score, correct): `pred` = NB-predicted label
    * under the corpus-trained model, `score` = its exact integer
    * log-posterior in 1e-4 nats, `correct` = pred == label. Docs with
    * no tokens (null text) score priors only. `labelCol` must be
    * non-null corpus-wide.
    */
  def nbClassify(docs: DataFrame, labelCol: String = "lang"): DataFrame = {
    val base = docs.select(col("doc_id"), col(labelCol).as("label"))
    // (r19: a restructure that folded the four explosion subtrees into
    // one persisted per-(doc, tok) multiplicity aggregate was A/B'd and
    // REVERTED — 2.02 → 4.60 s in the full-catalog bench. Per-doc tokens
    // are mostly unique here, so the (doc_id, tok)-keyed exchange +
    // cache carried occurrence-scale bytes, while each recomputed
    // explosion dies into a map-side partial aggregate or broadcast-join
    // sliver that shuffles almost nothing.)
    val toks = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col(labelCol).as("label"),
        explode(split(col("text"), " ")).as("tok"))
    // training: per-class occurrence counts + totals, corpus vocabulary,
    // doc-count priors — four count aggregates, nothing else
    val ct = toks.groupBy("label", "tok").agg(count(lit(1)).as("c"))
    val nl = ct.groupBy("label").agg(sum("c").as("n_l"))
    val vocabAndDocs = toks.agg(countDistinct(col("tok")).as("v"))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("n_docs"))))
    val prior = base.groupBy("label").agg(count(lit(1)).as("docs_l"))
      .crossJoin(broadcast(vocabAndDocs))
      .withColumn("q_prior",
        floor((log(col("docs_l").cast("double")) -
          log(col("n_docs").cast("double"))) * 10000.0 + 0.5).cast("long"))
      .select(col("label"), col("q_prior"))
    // dense (token x label) grid: unseen (tok, label) cells score with
    // c = 0 — without them a class missing one token would silently
    // skip the penalty term instead of paying it
    val grid = toks.select("tok").distinct()
      .crossJoin(broadcast(nl.select("label")))
      .join(ct, Seq("label", "tok"), "left")
      .na.fill(Map("c" -> 0L))
      .join(broadcast(nl), Seq("label"))
      .crossJoin(broadcast(vocabAndDocs.select("v")))
      .withColumn("q",
        floor((log(col("c").cast("double") + 1.0) -
          log((col("n_l") + col("v")).cast("double"))) * 10000.0 + 0.5)
          .cast("long"))
      .select(col("tok"), col("label").as("cand"), col("q"))
    // inference: token stream joins the grid (vocabulary-sized =>
    // broadcast), per-(doc, candidate) exact-long sums, priors added,
    // argmax with min-label ties
    val sums = toks.select(col("doc_id"), col("tok"))
      .join(broadcast(grid), Seq("tok"))
      .groupBy("doc_id", "cand")
      .agg(sum("q").as("sum_q"))
    val scored = base
      .crossJoin(broadcast(prior.withColumnRenamed("label", "cand")))
      .join(sums, Seq("doc_id", "cand"), "left")
      .withColumn("score", col("q_prior") + coalesce(col("sum_q"), lit(0L)))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("cand"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label"), col("cand").as("pred"),
        col("score"),
        (col("cand") === col("label")).cast("int").as("correct"))
      .orderBy("doc_id")
  }

  /** DuckDB SQL replicating [[nbClassify]] — training included. */
  def nbClassifyOracleSql(labelCol: String = "lang"): String =
    s"""WITH base AS (SELECT doc_id, $labelCol AS label FROM documents),
       |toks AS (
       |  SELECT doc_id, $labelCol AS label,
       |    unnest(string_split(text, ' ')) AS tok
       |  FROM documents WHERE text IS NOT NULL),
       |ct AS (
       |  SELECT label, tok, CAST(count(*) AS BIGINT) AS c
       |  FROM toks GROUP BY 1, 2),
       |nl AS (SELECT label, CAST(sum(c) AS BIGINT) AS n_l FROM ct GROUP BY 1),
       |vd AS (
       |  SELECT (SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM toks) AS v,
       |    (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_docs),
       |prior AS (
       |  SELECT label,
       |    CAST(floor((ln(CAST(count(*) AS DOUBLE)) -
       |      ln(CAST((SELECT n_docs FROM vd) AS DOUBLE))) * 10000.0 + 0.5)
       |      AS BIGINT) AS q_prior
       |  FROM base GROUP BY label),
       |grid AS (
       |  SELECT t.tok, l.label AS cand,
       |    CAST(floor((ln(CAST(COALESCE(ct.c, 0) AS DOUBLE) + 1.0) -
       |      ln(CAST(l.n_l + vd.v AS DOUBLE))) * 10000.0 + 0.5) AS BIGINT) AS q
       |  FROM (SELECT DISTINCT tok FROM toks) t
       |  CROSS JOIN nl l
       |  LEFT JOIN ct ON ct.label = l.label AND ct.tok = t.tok
       |  CROSS JOIN vd),
       |sums AS (
       |  SELECT tk.doc_id, g.cand, CAST(sum(g.q) AS BIGINT) AS sum_q
       |  FROM (SELECT doc_id, tok FROM toks) tk
       |  JOIN grid g ON g.tok = tk.tok
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT b.doc_id, b.label, p.label AS cand,
       |    p.q_prior + COALESCE(s.sum_q, 0) AS score
       |  FROM base b
       |  CROSS JOIN prior p
       |  LEFT JOIN sums s ON s.doc_id = b.doc_id AND s.cand = p.label)
       |SELECT doc_id, label, cand AS pred, CAST(score AS BIGINT) AS score,
       |  CAST(cand = label AS INTEGER) AS correct
       |FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
       |  FROM scored) WHERE rn = 1
       |ORDER BY doc_id""".stripMargin
}
