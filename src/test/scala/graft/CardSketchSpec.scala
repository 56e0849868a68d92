package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.QualityOps

/** Contract for the mergeable corpus card (q103): the monoid law —
  * merging per-batch sketches is bit-equal to one pass over the union,
  * for any batching — plus estimate exactness under k, agreement with
  * q91's exact card on the shared metrics, and empty-corpus totality.
  */
class CardSketchSpec extends SparkSpec {

  private lazy val docs =
    Queries.t(spark, "/root/testdata/sf0.001", "documents")

  private def rows(df: DataFrame): Seq[(String, Double)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

  test("monoid law: merged per-batch cards == single-pass card, any batching") {
    val single = rows(QualityOps.finalizeCard(
      QualityOps.mergeCardSketches(QualityOps.cardSketch(docs))))
    for (batches <- Seq(1, 2, 5)) {
      assert(rows(QualityOps.incrementalCorpusCard(docs, batches = batches)) === single,
        s"batches=$batches diverged from the single-pass card")
    }
  }

  test("estimates are EXACT whenever the domain has fewer than k distinct values") {
    // sf0.001: every domain (digests, vocab, langs, sources) is far under
    // k=1024, so the sketch holds the whole distinct set
    val m = rows(QualityOps.incrementalCorpusCard(docs)).toMap
    val exactDigests = docs.select(countDistinct(col("text"))).head().getLong(0)
    val exactVocab = docs.select(explode(split(col("text"), " ")).as("t"))
      .select(countDistinct(col("t"))).head().getLong(0)
    val exactLangs = docs.select(countDistinct(col("lang"))).head().getLong(0)
    val exactSources = docs.select(countDistinct(col("source"))).head().getLong(0)
    assert(m("est_digests") === exactDigests.toDouble)
    assert(m("est_vocab") === exactVocab.toDouble)
    assert(m("est_langs") === exactLangs.toDouble)
    assert(m("est_sources") === exactSources.toDouble)
    assert(m("n_docs") === docs.count().toDouble)
  }

  test("shared metrics agree with q91's exact card") {
    val inc = rows(QualityOps.incrementalCorpusCard(docs)).toMap
    val exact = rows(QualityOps.corpusCard(docs)).toMap
    assert(inc("n_docs") === exact("n_docs"))
    assert(inc("n_tokens") === exact("n_tokens"))
    assert(inc("mean_chars") === exact("mean_chars"))
    // under-k domains: the estimate IS the distinct count, so the
    // duplicate fraction matches the exact card's too
    assert(inc("est_vocab") === exact("n_vocab"))
    assert(inc("est_langs") === exact("n_langs"))
    assert(inc("est_sources") === exact("n_sources"))
    assert(inc("dup_doc_frac_est") === exact("dup_doc_frac"))
  }

  test("empty corpus: all-zero card, no divide-by-zero") {
    val none = docs.filter(col("doc_id") < 0)
    val m = rows(QualityOps.incrementalCorpusCard(none)).toMap
    assert(m("n_docs") === 0.0)
    assert(m("n_tokens") === 0.0)
    assert(m("dup_doc_frac_est") === 0.0)
    assert(m("mean_chars") === 0.0)
    assert(m("est_digests") === 0.0)
  }

  test("sketch state is bounded: k caps every min-hash array") {
    val k = 8
    val card = QualityOps.mergeCardSketches(QualityOps.cardSketch(docs, k), k)
    val r = card.head()
    for (c <- Seq("mh_digest", "mh_vocab", "mh_lang", "mh_source")) {
      val arr = r.getSeq[Long](r.fieldIndex(c))
      assert(arr.length <= k, s"$c exceeded k")
      assert(arr === arr.sorted, s"$c not ascending")
    }
  }
}
