package graft

import org.apache.spark.sql.functions._

import graft.ops.{StoreManifest, TextOps, TokenizerStore}

/** Lifecycle of the persisted tokenizer (merge-table) store: publish /
  * serve / retrain / time-travel / vacuum — the train-once
  * apply-everywhere contract made durable.
  */
class TokenizerStoreSpec extends SparkSpec {

  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("tokstore").toString

  private def corpus(words: (String, Int)*) =
    words.zipWithIndex.flatMap { case ((w, n), i) =>
      Seq.fill(n)(w).zipWithIndex.map { case (t, j) => (i * 1000L + j, t) }
    }.toDF("doc_id", "text")

  test("publish serves the trained table; store-applied encoding equals direct") {
    val dir = tmp()
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val v = TokenizerStore.trainAndPublish(spark, dir, docs, nMerges = 4)
    assert(v === 1L)
    val stored = TokenizerStore.currentMerges(spark, dir)
    val direct = TextOps.bpeMerges(docs, nMerges = 4).map(m => (m._2, m._3))
    assert(stored === direct)
    assert(stored === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // tokenizing FROM the store is bit-equal to tokenizing directly
    val a = TextOps.bpeTokenCounts(docs, stored).collect().map(_.toSeq).toSeq
    val b = TextOps.bpeTokenCounts(docs, direct).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("retrain publishes a new version; time-travel reproduces the old segmentation") {
    val dir = tmp()
    val docs1 = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    TokenizerStore.trainAndPublish(spark, dir, docs1, nMerges = 4)
    val m1 = TokenizerStore.currentMerges(spark, dir)
    // the corpus grows and shifts pair statistics: retrain -> v2
    val docs2 = docs1.unionByName(corpus("lowland" -> 20).select(
      (col("doc_id") + 9000000L).as("doc_id"), col("text")))
    val v2 = TokenizerStore.trainAndPublish(spark, dir, docs2, nMerges = 4)
    assert(v2 === 2L)
    val m2 = TokenizerStore.currentMerges(spark, dir)
    assert(m2 !== m1, "retrain on a shifted corpus must learn different ranks")
    // mergesAt(1) is the historical tokenizer, bit-for-bit
    assert(TokenizerStore.mergesAt(spark, dir, 1L) === m1)
    val old = TextOps.bpeTokenCounts(docs1, m1).collect().map(_.toSeq).toSeq
    val replay = TextOps.bpeTokenCounts(docs1,
      TokenizerStore.mergesAt(spark, dir, 1L)).collect().map(_.toSeq).toSeq
    assert(replay === old)
  }

  test("vacuum retires old versions; the serving snapshot is untouched") {
    val dir = tmp()
    val docs = corpus("low" -> 5, "newest" -> 6)
    TokenizerStore.trainAndPublish(spark, dir, docs, nMerges = 2)
    TokenizerStore.trainAndPublish(spark, dir, docs, nMerges = 3)
    val serving = TokenizerStore.currentMerges(spark, dir)
    StoreManifest.vacuum(spark, dir, keepVersions = 1)
    assert(TokenizerStore.currentMerges(spark, dir) === serving)
    intercept[IllegalArgumentException] {
      TokenizerStore.mergesAt(spark, dir, 1L) // retired by retention
    }
    // the swept store keeps exactly the serving version's data dir (the
    // name carries the publishing attempt's unique tag — see
    // trainAndPublish: racers write disjoint dirs, losers become
    // vacuum-swept orphans)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(names.size == 2 && names.contains("_manifest") &&
      names.exists(_.startsWith("merges-v000000002-")),
      s"swept store must keep only the manifest and v2's data dir: $names")
  }

  test("a never-published store serves the empty tokenizer") {
    assert(TokenizerStore.currentMerges(spark, tmp()) === Seq.empty)
  }
}
