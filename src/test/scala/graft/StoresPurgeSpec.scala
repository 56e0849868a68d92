package graft

import org.apache.spark.sql.functions._

/** Contract for [[graft.ops.Stores.purgeEverywhere]] — the cross-store
  * right-to-be-forgotten sweep. The property that matters: after the
  * purge, NO serving path (BM25, boolean, ANN, fused, either near-dup
  * probe) returns or is influenced by the purged docs; and because the
  * sweep is idempotent, "crashed mid-purge" recovers by re-running.
  */
class StoresPurgeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import graft.ops.{AnnPq, NearDup, Retrieval, SemDedup, Stores}

  private def corpus = spark.read.parquet(s"$sf/documents.parquet")
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def buildAll(): (String, String, String, String) = {
    val (p, s, q, m) = (dir("purgepost"), dir("purgesig"), dir("purgepq"), dir("purgesem"))
    Retrieval.writePostingsStore(corpus, p)
    NearDup.writeSignatureStore(corpus, s)
    AnnPq.writePqIndex(emb, q)
    SemDedup.writeSemanticStore(emb, m)
    (p, s, q, m)
  }

  test("purge: every serving path forgets the purged docs; a repeat purge is a no-op") {
    val (pDir, sDir, qDir, mDir) = buildAll()
    import spark.implicits._

    // two victims so every path is non-vacuously exercised: the lexical
    // top hit and the semantic top neighbor
    val vicLex = Retrieval.bm25TopKFromStore(spark, pDir)
      .collect().head.getAs[Long]("doc_id")
    val vicSem = AnnPq.ivfPqTopKFromIndex(emb, qDir)
      .collect().head.getAs[Long]("neighbor_id")
    val victims = Set(vicLex, vicSem)
    val vicLexDoc = corpus.filter(col("doc_id") === vicLex)
    val vicSemEmb = emb.filter(col("vec_id") === vicSem)
    assert(vicLexDoc.count() == 1 && vicSemEmb.count() == 1)

    // non-vacuity: before the purge both near-dup probes see their victim
    assert(NearDup.incrementalNearDupPairsFromStore(sDir, vicLexDoc)
      .filter(col("dup_of") === vicLex).count() > 0,
      "signature self-probe must match before the purge")
    assert(SemDedup.incrementalSemanticDedupFromStore(mDir, vicSemEmb)
      .filter(col("dup_of") === vicSem).count() > 0,
      "semantic self-probe must match before the purge")

    def assertForgotten(): Unit = {
      assert(!Retrieval.bm25TopKFromStore(spark, pDir).collect()
        .exists(r => victims(r.getAs[Long]("doc_id"))), "bm25 still serves a victim")
      assert(!Retrieval.booleanSearchFromStore(spark, pDir).collect()
        .exists(r => victims(r.getAs[Long]("doc_id"))), "boolean still serves a victim")
      assert(!AnnPq.ivfPqTopKFromIndex(emb, qDir).collect()
        .exists(r => victims(r.getAs[Long]("neighbor_id"))), "ANN still serves a victim")
      assert(!Retrieval.hybridTopKFromStores(spark, pDir, qDir, emb).collect()
        .exists(r => victims(r.getAs[Long]("doc_id"))), "fusion still serves a victim")
      assert(NearDup.incrementalNearDupPairsFromStore(sDir, vicLexDoc)
        .filter(col("dup_of").isin(victims.toSeq: _*)).count() == 0,
        "signature probe still matches a victim")
      assert(SemDedup.incrementalSemanticDedupFromStore(mDir, vicSemEmb)
        .filter(col("dup_of").isin(victims.toSeq: _*)).count() == 0,
        "semantic probe still matches a victim")
    }

    val receipt = Stores.purgeEverywhere(
      victims.toSeq.toDF("doc_id"), pDir, sDir, qDir, mDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(receipt.keySet === Set("postings", "signatures", "pq_index", "semantic"))
    assert(receipt.values.forall(_ >= 2L), s"every store must have re-published: $receipt")
    assertForgotten()

    // the GDPR job re-runs until clean: a repeat must neither fail nor
    // change what serves
    Stores.purgeEverywhere(victims.toSeq.toDF("doc_id"), pDir, sDir, qDir, mDir)
    assertForgotten()
  }

  test("crash mid-purge: a store prefix purged, the re-run completes the sweep") {
    val (pDir, sDir, qDir, mDir) = buildAll()
    import spark.implicits._
    val victim = AnnPq.ivfPqTopKFromIndex(emb, qDir)
      .collect().head.getAs[Long]("neighbor_id")
    val vicEmb = emb.filter(col("vec_id") === victim)

    // the crash: only the first two store-local deletes ran
    Retrieval.deleteFromPostingsStore(Seq(victim).toDF("doc_id"), pDir)
    NearDup.deleteFromSignatureStore(Seq(victim).toDF("doc_id"), sDir)

    // the sweep is provably incomplete — the vector stores still serve
    assert(AnnPq.ivfPqTopKFromIndex(emb, qDir).collect()
      .exists(_.getAs[Long]("neighbor_id") == victim))
    assert(SemDedup.incrementalSemanticDedupFromStore(mDir, vicEmb)
      .filter(col("dup_of") === victim).count() > 0)

    // recovery = re-run the whole purge
    Stores.purgeEverywhere(Seq(victim).toDF("doc_id"), pDir, sDir, qDir, mDir)
    assert(!AnnPq.ivfPqTopKFromIndex(emb, qDir).collect()
      .exists(_.getAs[Long]("neighbor_id") == victim))
    assert(SemDedup.incrementalSemanticDedupFromStore(mDir, vicEmb)
      .filter(col("dup_of") === victim).count() == 0)
    assert(!Retrieval.bm25TopKFromStore(spark, pDir).collect()
      .exists(_.getAs[Long]("doc_id") == victim))
  }
}
