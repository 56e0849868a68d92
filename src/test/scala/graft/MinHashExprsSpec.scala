package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.NearDup

/** Contract for the native [[graft.functions.MinHashSig]] signature path:
  * frame-identical to the explode + 64-min-aggregate form it replaced,
  * same edge semantics, single evaluation per row, shuffle-free plan.
  */
class MinHashExprsSpec extends SparkSpec {

  /** The exact pre-round-11 aggregate signature form, as parity baseline. */
  private def aggSignatures(tok: DataFrame): DataFrame = {
    val tokenHash = (t: org.apache.spark.sql.Column) =>
      conv(substring(md5(t.cast("binary")), 1, 7), 16, 10).cast("long")
    val hashed = tok
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .select(col("doc_id"), tokenHash(col("tok")).as("x"))
    val aggs = NearDup.seeds.zipWithIndex.map { case ((a, b), i) =>
      min((col("x") * a + b) % NearDup.P).as(s"m$i")
    }
    hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  private lazy val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")

  test("native signatures equal the aggregate form frame-for-frame on real docs") {
    val tok = NearDup.tokens(docs)
    val native = NearDup.signatures(tok)
    val agg = aggSignatures(tok)
    assert(native.count() > 0)
    assert(native.exceptAll(agg).count() === 0)
    assert(agg.exceptAll(native).count() === 0)
  }

  test("edge parity: null toks and empty toks absent; all-null toks give null minima") {
    import spark.implicits._
    val tok = Seq(
      (0L, Seq("a", "b")),
      (1L, null.asInstanceOf[Seq[String]]),
      (2L, Seq.empty[String]),
      (3L, Seq(null.asInstanceOf[String], null.asInstanceOf[String])),
      (4L, Seq("a", null.asInstanceOf[String]))) // null token ignored in minima
      .toDF("doc_id", "toks")
    val native = NearDup.signatures(tok).orderBy("doc_id")
    val agg = aggSignatures(tok).orderBy("doc_id")
    val n = native.collect()
    val a = agg.collect()
    assert(n.map(_.getLong(0)).toSeq === Seq(0L, 3L, 4L))
    assert(a.map(_.getLong(0)).toSeq === Seq(0L, 3L, 4L))
    n.zip(a).foreach { case (rn, ra) =>
      (0 to NearDup.K).foreach { i =>
        assert(rn.isNullAt(i) === ra.isNullAt(i), s"col $i of doc ${rn.getLong(0)}")
        if (!rn.isNullAt(i)) assert(rn.get(i) === ra.get(i))
      }
    }
    // doc 3 (all-null tokens): present with all-null minima
    assert(n(1).isNullAt(1) && n(1).isNullAt(NearDup.K))
    // doc 4: null token ignored, minima equal doc-0-with-only-"a" pattern
    assert(!n(2).isNullAt(1))
  }

  test("plan: one signature evaluation per row, only the spreading exchange") {
    val plan = NearDup.signatures(NearDup.tokens(docs))
      .queryExecution.executedPlan
    val s = plan.toString
    val evals = "minhash_sig".r.findAllIn(s).length
    assert(evals === 1, s"expected exactly 1 minhash_sig in plan, got $evals:\n$s")
    // exactly the doc_id repartition that spreads the map — no aggregate
    // exchange, no second shuffle (string match: AQE wraps the plan and
    // hides the exchanges from collect()). REPARTITION_BY_NUM, not
    // _BY_COL: the explicit width is what stops AQE's byte-targeted
    // coalescing from folding the spread back to one partition (r13)
    assert("Exchange ".r.findAllIn(s).length === 1, s)
    assert(s.contains("REPARTITION_BY_NUM"), s)
    assert(!s.contains("HashAggregate"), s)
  }
}
