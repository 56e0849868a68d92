package graft

import org.apache.spark.sql.functions._

/** ScaleCurve corpus synthesis: the scale factors must multiply SIZE
  * without changing similarity STRUCTURE — intra-replica token/cosine
  * relations preserved exactly, cross-replica relations broken — so the
  * measured runtime curve is attributable to scale alone.
  */
class ScaleCurveSpec extends SparkSpec {

  test("scaleDocuments: size multiplies, ids unique, intra-replica jaccard preserved") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta", "en", "s", 22L),
      (1L, "alpha beta gamma DELTA9", "en", "s", 23L),
      (2L, "wholly unrelated words here", "en", "s", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val scaled = ScaleCurve.scaleDocuments(docs, 3).cache()
    assert(scaled.count() == 9)
    assert(scaled.select("doc_id").distinct().count() == 9)

    // token-overlap counts between the same two docs must be identical in
    // every replica (translate preserves token equality within a replica)
    def overlap(df: org.apache.spark.sql.DataFrame, a: Long, b: Long): Long = {
      val toks = df.filter(col("doc_id").isin(a, b))
        .select(split(lower(col("text")), " ").as("t"))
        .collect().map(_.getSeq[String](0).toSet)
      (toks(0) & toks(1)).size.toLong
    }
    val base01 = overlap(scaled, 0L, 1L)
    assert(base01 == 3L) // alpha beta gamma
    // stride pads max(doc_id)+1 = 3 up to 10 (mod-10 alignment for the
    // q78 %5 and q92 %10 split cells), so replica r starts at r*10
    (1 to 2).foreach { r =>
      val s = r * 10L
      assert(overlap(scaled, s, s + 1) == base01, s"replica $r lost intra-similarity")
    }
    // cross-replica: the SAME doc in different replicas shares no tokens
    val cross = scaled.filter(col("doc_id").isin(0L, 10L))
      .select(split(lower(col("text")), " ").as("t"))
      .collect().map(_.getSeq[String](0).toSet)
    assert((cross(0) & cross(1)).isEmpty, s"cross-replica leak: ${cross(0) & cross(1)}")
  }

  test("scaleDocuments rejects factors beyond the rotation period") {
    import spark.implicits._
    val docs = Seq((0L, "a", "en", "s", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    // replica 26 would reuse rotation 0 and leak cross-replica near-dups
    intercept[IllegalArgumentException](ScaleCurve.scaleDocuments(docs, 27))
  }

  test("scaleDocuments rejects rotation-invariant tokens by their exact leak period") {
    import spark.implicits._
    def d(text: String) =
      Seq((0L, text, "en", "s", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // pure punctuation is invariant under EVERY rotation → leaks at any factor > 1
    intercept[IllegalArgumentException](ScaleCurve.scaleDocuments(d("alpha -- beta"), 2))
    // digit+punctuation rotates with period 10 → fine at factor ≤ 10, leaks beyond
    assert(ScaleCurve.scaleDocuments(d("alpha 3.14 beta"), 2).count() == 2)
    intercept[IllegalArgumentException](ScaleCurve.scaleDocuments(d("alpha 3.14 beta"), 11))
    // pure digits: same period-10 bound (the pre-existing guard, now subsumed)
    assert(ScaleCurve.scaleDocuments(d("alpha 42 beta"), 10).count() == 10)
    intercept[IllegalArgumentException](ScaleCurve.scaleDocuments(d("alpha 42 beta"), 11))
    // any letter in the token separates all replicas — never rejected
    assert(ScaleCurve.scaleDocuments(d("alpha x9.9 beta"), 12).count() == 12)
    // the EMPTY token (split on consecutive spaces) is rotation-invariant
    // too — the near-dup tokenizer keeps it, so it leaks at any factor > 1
    intercept[IllegalArgumentException](ScaleCurve.scaleDocuments(d("alpha  beta"), 2))
    intercept[IllegalArgumentException](ScaleCurve.scaleDocuments(d(" alpha beta"), 2))
  }

  test("scaleEmbeddings: size multiplies, intra-replica cosines exact, norms preserved") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f), 0),
      (1L, Seq(1f, 2f, 3f, 4f, 5f, 6f, 7f, 9f), 0),
      (2L, Seq(-4f, 3f, -2f, 1f, 0f, 2f, -1f, 5f), 1))
      .toDF("vec_id", "embedding", "label")
    val scaled = ScaleCurve.scaleEmbeddings(emb, 3).cache()
    assert(scaled.count() == 9)
    assert(scaled.select("vec_id").distinct().count() == 9)
    val vecs = scaled.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val base = cos(vecs(0L), vecs(1L))
    // vec stride pads max(vec_id)+1 = 3 up to 50 (mod-50 alignment for
    // the q98 incremental cell), so replica r starts at r*50
    (1 to 2).foreach { r =>
      val s = r * 50L
      // rotation permutes components: dot/norm sums reorder, so compare
      // to double-precision tolerance, not bit-for-bit
      assert(math.abs(cos(vecs(s), vecs(s + 1)) - base) < 1e-12,
        s"replica $r changed cosine structure")
      assert(math.abs(vecs(s).map(x => x * x).sum - vecs(0L).map(x => x * x).sum) < 1e-9)
    }
  }

  test("scaleEvents: users disjoint across replicas, funnel counts exactly linear") {
    val events = Queries.t(spark, "/root/testdata/sf0.001", "events")
    val scaled = ScaleCurve.scaleEvents(events, 2).cache()
    assert(scaled.count() === 2 * events.count())
    // event ids unique; non-null users disjoint across replicas
    assert(scaled.select("event_id").distinct().count() === scaled.count())
    val baseUsers = events.filter(col("user_id").isNotNull)
      .select("user_id").distinct().count()
    assert(scaled.filter(col("user_id").isNotNull)
      .select("user_id").distinct().count() === 2 * baseUsers)
    // journeys replicate exactly: every funnel step count doubles
    val base = graft.ops.Behavior.funnelSteps(events)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val doubled = graft.ops.Behavior.funnelSteps(scaled)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(doubled === base.view.mapValues(_ * 2).toMap)
    // and the windowed form too (the q117 cell's contract)
    val baseW = graft.ops.Behavior.funnelStepsWindowed(events)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val doubledW = graft.ops.Behavior.funnelStepsWindowed(scaled)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(doubledW === baseW.view.mapValues(_ * 2).toMap)
    scaled.unpersist()
  }
}
