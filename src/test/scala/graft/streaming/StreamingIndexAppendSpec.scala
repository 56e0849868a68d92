package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{AnnPq, NearDup, Retrieval, SemDedup, StoreManifest}

/** Contract for streaming index maintenance
  * ([[StreamingEtl.runIndexAppend]]): a time-split document stream
  * folded into a persisted store through RESTARTS produces a store
  * bit-equal to the batch-built store over the same corpus, and a
  * replayed foreachBatch id (at-least-once delivery) is provably
  * ignored — the manifest `batchWatermark` makes the dedup decision
  * atomic with the data publish.
  */
class StreamingIndexAppendSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def corpus = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text")

  test("postings store: streamed appends across a restart == batch-built store; replay ignored") {
    val in = tmpDir("idx-in")
    val ckpt = tmpDir("idx-ckpt")
    val streamStore = tmpDir("idx-stream").toString
    val batchStore = tmpDir("idx-batch").toString
    val s0 = corpus.filter(col("doc_id") % 3 === 0)
    val s1 = corpus.filter(col("doc_id") % 3 === 1)
    val s2 = corpus.filter(col("doc_id") % 3 === 2)

    // the production loop: base indexed once, nightly drops streamed in
    Retrieval.writePostingsStore(s0, streamStore)
    writeFile(in, "night1.json", s1.toJSON.collect().mkString("\n"))
    def drain(): Unit = StreamingEtl.runIndexAppend(
      spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1).json(in.toString),
      ckpt.toString,
      (batch, id) => Retrieval.appendPostingsStore(batch, streamStore, batchId = id))
    drain()
    // RESTART: a second drop lands, the query restarts on the same
    // checkpoint — only the new file becomes a batch
    writeFile(in, "night2.json", s2.toJSON.collect().mkString("\n"))
    drain()

    val snap = StoreManifest.currentSnapshot(spark, streamStore).get
    assert(snap.batchWatermark === 1L,
      s"two streamed batches must fold as ids 0 and 1, got ${snap.batchWatermark}")

    // at-least-once replay: re-delivering ANY already-folded id must not
    // publish (this call is exactly the foreachBatch body)
    Retrieval.appendPostingsStore(s1, streamStore, batchId = 0L)
    Retrieval.appendPostingsStore(s2, streamStore, batchId = 1L)
    assert(StoreManifest.currentSnapshot(spark, streamStore).get.version
      === snap.version, "replayed batch ids must be ignored before any write")

    // bit-equal to the batch-built store over the same corpus slices
    Retrieval.writePostingsStore(s0, batchStore)
    Retrieval.appendPostingsStore(s1, batchStore)
    Retrieval.appendPostingsStore(s2, batchStore)
    def component(dir: String, name: String): Set[Seq[Any]] = {
      val sn = StoreManifest.currentSnapshot(spark, dir).get
      StoreManifest.readComponent(spark, dir, sn, name)
        .map(_.collect().map(_.toSeq).toSet).getOrElse(Set.empty)
    }
    for (name <- Seq("postings", "stats", "doclens"))
      assert(component(streamStore, name) === component(batchStore, name),
        s"streamed store component $name diverged from the batch build")
    val served = Retrieval.bm25TopKFromStore(spark, streamStore).collect().toSeq
    assert(served === Retrieval.bm25TopK(corpus).collect().toSeq)
    assert(served.nonEmpty)
  }

  test("signature store: streamed appends across a restart == batch-built store") {
    val in = tmpDir("sig-in")
    val ckpt = tmpDir("sig-ckpt")
    val streamStore = tmpDir("sig-stream").toString
    val batchStore = tmpDir("sig-batch").toString
    val s0 = corpus.filter(col("doc_id") % 3 === 0)
    val s1 = corpus.filter(col("doc_id") % 3 === 1)
    val s2 = corpus.filter(col("doc_id") % 3 === 2)

    NearDup.writeSignatureStore(s0, streamStore)
    def drain(): Unit = StreamingEtl.runIndexAppend(
      spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1).json(in.toString),
      ckpt.toString,
      (batch, id) => NearDup.appendSignatureStore(batch, streamStore, batchId = id))
    writeFile(in, "night1.json", s1.toJSON.collect().mkString("\n"))
    drain()
    writeFile(in, "night2.json", s2.toJSON.collect().mkString("\n"))
    drain()

    val snap = StoreManifest.currentSnapshot(spark, streamStore).get
    NearDup.appendSignatureStore(s1, streamStore, batchId = 1L) // replay
    assert(StoreManifest.currentSnapshot(spark, streamStore).get.version
      === snap.version)

    NearDup.writeSignatureStore(s0, batchStore)
    NearDup.appendSignatureStore(s1, batchStore)
    NearDup.appendSignatureStore(s2, batchStore)
    def component(dir: String, name: String): Set[Seq[Any]] = {
      val sn = StoreManifest.currentSnapshot(spark, dir).get
      StoreManifest.readComponent(spark, dir, sn, name)
        .map(_.collect().map(_.toSeq).toSet).getOrElse(Set.empty)
    }
    for (name <- Seq("tokens", "bands"))
      assert(component(streamStore, name) === component(batchStore, name))
    assert(component(streamStore, "tokens").nonEmpty)
  }

  test("pq index and semantic store: replayed batch ids are ignored before any write") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val base = emb.filter(col("vec_id") % 5 =!= 4 || col("vec_id") < 16)
    val delta = emb.filter(col("vec_id") % 5 === 4 && col("vec_id") >= 16)

    val pqDir = tmpDir("pq-stream").toString
    AnnPq.writePqIndex(base, pqDir)
    AnnPq.appendPqIndex(delta, pqDir, batchId = 0L)
    val pqSnap = StoreManifest.currentSnapshot(spark, pqDir).get
    assert(pqSnap.batchWatermark === 0L)
    AnnPq.appendPqIndex(delta, pqDir, batchId = 0L) // replay
    assert(StoreManifest.currentSnapshot(spark, pqDir).get.version === pqSnap.version)

    val semDir = tmpDir("sem-stream").toString
    SemDedup.writeSemanticStore(base, semDir)
    SemDedup.appendSemanticStore(delta, semDir, batchId = 0L)
    val semSnap = StoreManifest.currentSnapshot(spark, semDir).get
    assert(semSnap.batchWatermark === 0L)
    SemDedup.appendSemanticStore(delta, semDir, batchId = 0L) // replay
    assert(StoreManifest.currentSnapshot(spark, semDir).get.version === semSnap.version)
  }

  test("semantic store: appended store == written-from-union store (same quantizer)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    // base keeps every vec_id < 16 so the first-k quantizers of base and
    // union coincide (the q98 append-split convention)
    val base = emb.filter(col("vec_id") % 5 =!= 4 || col("vec_id") < 16)
    val delta = emb.filter(col("vec_id") % 5 === 4 && col("vec_id") >= 16)
    val appended = tmpDir("sem-app").toString
    val unionDir = tmpDir("sem-union").toString
    SemDedup.writeSemanticStore(base, appended)
    SemDedup.appendSemanticStore(delta, appended)
    SemDedup.writeSemanticStore(emb, unionDir)
    def component(dir: String, name: String, schema: Option[String]): Set[Seq[Any]] = {
      val sn = StoreManifest.currentSnapshot(spark, dir).get
      StoreManifest.readComponent(spark, dir, sn, name, schema)
        .map(_.collect().map(_.toSeq).toSet).getOrElse(Set.empty)
    }
    val aSchema = Some("vec_id LONG, embedding ARRAY<FLOAT>, nrm DOUBLE, list_id LONG")
    assert(component(appended, "assigned", aSchema) ===
      component(unionDir, "assigned", aSchema))
    assert(component(appended, "edges", None) === component(unionDir, "edges", None))
    assert(component(appended, "edges", None).nonEmpty,
      "no edges in the fixture — append parity is vacuous")
  }

  test("dedup gate: streamed probe+admit loop across a restart == the sequential batch fold; replay no-op") {
    val in = tmpDir("gate-in")
    val ckpt = tmpDir("gate-ckpt")
    val decisions = tmpDir("gate-dec").toString
    val streamStore = tmpDir("gate-stream").toString
    val batchStore = tmpDir("gate-batch").toString
    val s0 = corpus.filter(col("doc_id") % 3 === 0)
    val s1 = corpus.filter(col("doc_id") % 3 === 1)
    val s2 = corpus.filter(col("doc_id") % 3 === 2)

    NearDup.writeSignatureStore(s0, streamStore)
    def drain(): Unit = StreamingEtl.runDedupGate(
      spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1).json(in.toString),
      ckpt.toString, streamStore, decisions)
    writeFile(in, "night1.json", s1.toJSON.collect().mkString("\n"))
    drain()
    writeFile(in, "night2.json", s2.toJSON.collect().mkString("\n"))
    drain() // RESTART on the same checkpoint: only night2 is a new batch

    // reference: the same admission fold through the batch APIs
    NearDup.writeSignatureStore(s0, batchStore)
    val refDecisions = Seq(s1, s2).map { s =>
      val storeDups = NearDup.incrementalNearDupPairsFromStore(batchStore, s)
        .select(col("doc_id"), col("dup_of"))
      val withinDups = NearDup.lshNearDupPairs(s, sliceMax = None)
        .select(col("doc_b").as("doc_id"), col("doc_a").as("dup_of"))
      val losers = storeDups.unionByName(withinDups)
        .select("doc_id").distinct()
      val keepers = s.join(losers, Seq("doc_id"), "left_anti")
      val dec = storeDups.unionByName(withinDups)
        .collect().map(_.toSeq).toSet
      NearDup.appendSignatureStore(keepers, batchStore)
      dec
    }

    def component(dir: String, name: String): Set[Seq[Any]] = {
      val sn = StoreManifest.currentSnapshot(spark, dir).get
      StoreManifest.readComponent(spark, dir, sn, name)
        .map(_.collect().map(_.toSeq).toSet).getOrElse(Set.empty)
    }
    for (name <- Seq("tokens", "bands"))
      assert(component(streamStore, name) === component(batchStore, name),
        s"gated store component $name diverged from the batch fold")

    // decisions match the reference fold per batch, and are non-vacuous
    for ((want, b) <- refDecisions.zipWithIndex) {
      val got = spark.read.parquet(s"$decisions/batch=$b")
        .select("doc_id", "dup_of").collect().map(_.toSeq).toSet
      assert(got === want, s"batch $b decisions diverged")
    }
    assert(refDecisions.exists(_.nonEmpty),
      "fixture vacuous: the gate never rejected a doc")

    // at-least-once replay: a fresh checkpoint re-delivers both files as
    // batch ids 0 and 1 — both are behind the watermark and must be
    // skipped entirely (store version AND decisions untouched)
    val verBefore = StoreManifest.currentSnapshot(spark, streamStore).get.version
    val decBefore = spark.read.parquet(s"$decisions/batch=0")
      .collect().map(_.toSeq).toSet
    val ckpt2 = tmpDir("gate-ckpt2")
    StreamingEtl.runDedupGate(
      spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1).json(in.toString),
      ckpt2.toString, streamStore, decisions)
    assert(StoreManifest.currentSnapshot(spark, streamStore).get.version === verBefore,
      "replayed batches must not publish")
    assert(spark.read.parquet(s"$decisions/batch=0")
      .collect().map(_.toSeq).toSet === decBefore,
      "replayed batches must not rewrite decisions")
  }
}
