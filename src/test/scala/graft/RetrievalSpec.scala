package graft

import org.apache.spark.sql.functions._

/** Contract for the retrieval operators: BM25 ranking behavior
  * ([[graft.ops.Retrieval.bm25TopK]], q106) and exact positional phrase
  * search ([[graft.ops.TextOps.phrasePositions]], q108).
  */
class RetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import graft.ops.{Retrieval, StoreManifest}

  private def corpus = spark.read.parquet(s"$sf/documents.parquet")

  /** One component of the CURRENT published snapshot, as a value set. */
  private def component(dir: String, name: String): Set[Seq[Any]] = {
    val snap = StoreManifest.currentSnapshot(spark, dir).get
    StoreManifest.readComponent(spark, dir, snap, name)
      .map(_.collect().map(_.toSeq).toSet).getOrElse(Set.empty)
  }

  test("postings store: scoring from the store is bit-equal to the direct scan") {
    val dir = java.nio.file.Files.createTempDirectory("bm25store").toString
    Retrieval.writePostingsStore(corpus, dir)
    val direct = Retrieval.bm25TopK(corpus).collect().toSeq
    val stored = Retrieval.bm25TopKFromStore(spark, dir).collect().toSeq
    assert(stored === direct)
    assert(stored.nonEmpty)
  }

  test("postings store: base + appended delta is bit-equal to the union corpus") {
    val dir = java.nio.file.Files.createTempDirectory("bm25store").toString
    // split on doc_id parity: every append carries fresh doc ids
    val base = corpus.filter(col("doc_id") % 2 === 0)
    val delta = corpus.filter(col("doc_id") % 2 === 1)
    Retrieval.writePostingsStore(base, dir)
    Retrieval.appendPostingsStore(delta, dir)
    val direct = Retrieval.bm25TopK(corpus).collect().toSeq
    val stored = Retrieval.bm25TopKFromStore(spark, dir).collect().toSeq
    assert(stored === direct)
    assert(stored.nonEmpty)
  }

  test("postings store: delete serves the live corpus; compact equals a rebuilt index") {
    val dir = java.nio.file.Files.createTempDirectory("bm25store").toString
    val rebuiltDir = java.nio.file.Files.createTempDirectory("bm25rebuilt").toString
    val base = corpus.filter(col("doc_id") % 2 === 0)
    val delta = corpus.filter(col("doc_id") % 2 === 1)
    val deleted = corpus.filter(col("doc_id") % 3 === 0)
    val survivors = corpus.filter(col("doc_id") % 3 =!= 0)

    // append + delete: scoring must equal a direct scan of the survivors
    Retrieval.writePostingsStore(base, dir)
    Retrieval.appendPostingsStore(delta, dir)
    Retrieval.deleteFromPostingsStore(deleted.select("doc_id"), dir)
    val direct = Retrieval.bm25TopK(survivors).collect().toSeq
    assert(Retrieval.bm25TopKFromStore(spark, dir).collect().toSeq === direct)
    assert(direct.nonEmpty)

    // delete is idempotent and self-validating (the r14 advisory):
    // re-deleting the same docs, or deleting ids never indexed, must
    // not publish a snapshot — no phantom negative stats partial
    val vAfterDelete = StoreManifest.currentSnapshot(spark, dir).get.version
    Retrieval.deleteFromPostingsStore(deleted.select("doc_id"), dir)
    import spark.implicits._
    Retrieval.deleteFromPostingsStore(
      Seq(999999L, 888888L).toDF("doc_id"), dir)
    assert(StoreManifest.currentSnapshot(spark, dir).get.version === vAfterDelete,
      "double-delete / never-indexed delete must be a provable no-op")
    assert(Retrieval.bm25TopKFromStore(spark, dir).collect().toSeq === direct)

    // compact: tombstones folded in — postings and stats bit-equal to an
    // index rebuilt from the survivors, scoring unchanged, log gone
    Retrieval.compactPostingsStore(spark, dir)
    Retrieval.writePostingsStore(survivors, rebuiltDir)
    def stats(d: String) = {
      val snap = StoreManifest.currentSnapshot(spark, d).get
      StoreManifest.readComponent(spark, d, snap, "stats").get
        .agg(sum("n_docs"), sum("sum_dl")).collect().map(_.toSeq).toSeq
    }
    assert(component(dir, "postings") === component(rebuiltDir, "postings"))
    assert(component(dir, "doclens") === component(rebuiltDir, "doclens"))
    assert(stats(dir) === stats(rebuiltDir))
    val compacted = StoreManifest.currentSnapshot(spark, dir).get
    assert(StoreManifest.readComponent(spark, dir, compacted, "stats").get
      .count() === 1L,
      "compaction must collapse the stats partials to one row")
    assert(compacted.components.getOrElse("tombstones", Nil).isEmpty,
      "compaction must drop the tombstone log from the manifest")
    assert(Retrieval.bm25TopKFromStore(spark, dir).collect().toSeq === direct)
  }

  test("postings store: a crash before the manifest publish leaves the prior snapshot serving bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("bm25crash").toString
    val base = corpus.filter(col("doc_id") % 3 =!= 0)
    Retrieval.writePostingsStore(base, dir)
    Retrieval.deleteFromPostingsStore(
      corpus.filter(col("doc_id") % 2 === 0).select("doc_id"), dir)
    val before = Retrieval.bm25TopKFromStore(spark, dir).collect().toSeq
    val snapBefore = StoreManifest.currentSnapshot(spark, dir).get

    // crash state 1: a compaction died AFTER writing every rewritten
    // data dir but BEFORE the single manifest rename — exactly the
    // window where the r14 delete-then-rename swap lost the store.
    // Emulate it literally: produce v+1's dirs with no v+1 manifest.
    val v = snapBefore.version + 1
    val live = StoreManifest
      .readComponent(spark, dir, snapBefore, "postings",
        Some("tok STRING, doc_id LONG, tf LONG, dl LONG, bucket INT")).get
      .limit(3)
    live.write.partitionBy("bucket")
      .parquet(s"$dir/${StoreManifest.componentDir("postings", v)}")
    // crash state 2: a publish died mid-write — a torn .tmp manifest
    val tmp = new java.io.FileOutputStream(
      s"$dir/_manifest/.v${"%09d".format(v)}.json.tmp")
    tmp.write("{\"version\": 99".getBytes); tmp.close()

    // the store must still resolve and serve the pre-crash snapshot
    assert(StoreManifest.currentSnapshot(spark, dir).get.version === snapBefore.version)
    assert(Retrieval.bm25TopKFromStore(spark, dir).collect().toSeq === before)
    // recovery = simply retrying the mutation: the next version number
    // is taken by a fresh write (Overwrite mode replaces the orphan)
    Retrieval.compactPostingsStore(spark, dir)
    assert(Retrieval.bm25TopKFromStore(spark, dir).collect().toSeq === before)
    // vacuum sweeps the orphan dirs and pre-compact history
    StoreManifest.vacuum(spark, dir, keepVersions = 1)
    val kept = StoreManifest.currentSnapshot(spark, dir).get
      .components.valuesIterator.flatten.toSet
    val onDisk = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filterNot(_ == "_manifest").toSet
    assert(onDisk === kept, s"vacuum left orphans: ${onDisk -- kept}")
    assert(Retrieval.bm25TopKFromStore(spark, dir).collect().toSeq === before)
  }

  test("postings store: readAsOf(v) equals the store rebuilt from the first v batches") {
    val dir = java.nio.file.Files.createTempDirectory("bm25asof").toString
    val b1 = corpus.filter(col("doc_id") % 3 === 0)
    val b2 = corpus.filter(col("doc_id") % 3 === 1)
    val b3 = corpus.filter(col("doc_id") % 3 === 2)
    Retrieval.writePostingsStore(b1, dir) // v1
    Retrieval.appendPostingsStore(b2, dir) // v2
    Retrieval.appendPostingsStore(b3, dir) // v3
    def rebuilt(df: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(df).collect().toSeq
    assert(Retrieval.bm25TopKFromStore(spark, dir, asOfVersion = Some(1L))
      .collect().toSeq === rebuilt(b1))
    assert(Retrieval.bm25TopKFromStore(spark, dir, asOfVersion = Some(2L))
      .collect().toSeq === rebuilt(b1.unionByName(b2)))
    assert(Retrieval.bm25TopKFromStore(spark, dir, asOfVersion = Some(3L))
      .collect().toSeq === rebuilt(corpus))
    // a delete publishes v4; v3 still serves the pre-delete corpus
    Retrieval.deleteFromPostingsStore(
      corpus.filter(col("doc_id") % 2 === 0).select("doc_id"), dir)
    assert(Retrieval.bm25TopKFromStore(spark, dir, asOfVersion = Some(3L))
      .collect().toSeq === rebuilt(corpus))
    assert(Retrieval.bm25TopKFromStore(spark, dir).collect().toSeq ===
      rebuilt(corpus.filter(col("doc_id") % 2 === 1)))
  }

  test("postings store: the query scan is partition-pruned to the terms' buckets") {
    val dir = java.nio.file.Files.createTempDirectory("bm25store").toString
    Retrieval.writePostingsStore(corpus, dir, nBuckets = 16)
    val out = Retrieval.bm25TopKFromStore(spark, dir,
      queries = Seq(1L -> Seq("hash")), nBuckets = 16)
    out.collect() // materialize the AQE final plan
    // the scan's selected partitions must be a strict subset of what
    // exists on disk: only the one term's bucket directory is read
    val postingsDir = StoreManifest.currentSnapshot(spark, dir).get
      .components("postings").head
    val allBuckets = new java.io.File(s"$dir/$postingsDir").listFiles()
      .count(_.getName.startsWith("bucket="))
    assert(allBuckets > 1)
    val scans = planLeaves(out.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.getOrElse("Location", "").contains("postings") => s
    }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.selectedPartitions.partitionCount < allBuckets,
        s"scan read ${s.selectedPartitions.partitionCount} of $allBuckets buckets")
    }
  }

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bm25: a doc saturated with the query terms outranks a diluted one") {
    val docs = docsDf(Seq(
      1L -> "hash join hash join hash join",
      2L -> ("hash join " + Seq.fill(60)("filler").mkString(" ")),
      3L -> "completely unrelated text about nothing",
      4L -> "hash alone no second term"))
    val out = Retrieval
      .bm25TopK(docs, Seq(1L -> Seq("hash", "join")), topK = 10)
      .collect()
    val ranked = out.map(r => r.getAs[Long]("doc_id"))
    // doc 3 matches nothing → absent; doc 1 (dense, short) first;
    // doc 2 (diluted by length) behind it; doc 4 (one term) last
    assert(!ranked.contains(3L))
    assert(ranked.head === 1L)
    assert(ranked.indexOf(2L) < ranked.indexOf(4L))
  }

  test("bm25: a corpus-rare term outweighs a ubiquitous one at equal tf") {
    val common = (1L to 20L).map(i => i -> s"common doc $i")
    val docs = docsDf(common ++ Seq(
      100L -> "common text here",
      101L -> "rare text here"))
    val out = Retrieval
      .bm25TopK(docs, Seq(1L -> Seq("common"), 2L -> Seq("rare")), topK = 30)
      .collect()
    val commonTop = out.filter(_.getAs[Long]("query_id") == 1L)
      .map(r => r.getAs[Double]("score")).max
    val rareTop = out.filter(_.getAs[Long]("query_id") == 2L)
      .map(r => r.getAs[Double]("score")).max
    assert(rareTop > commonTop,
      s"idf inverted: rare=$rareTop common=$commonTop")
  }

  test("bm25: partition-independent on the real corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = Retrieval.bm25TopK(docs).collect().toSeq
    val b = Retrieval.bm25TopK(docs.repartition(7)).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("bm25: every returned doc contains at least one query term") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val hits = Retrieval.bm25TopK(docs).select("doc_id").distinct()
    val noTerm = hits.join(docs, "doc_id")
      .filter(!col("text").contains("hash") && !col("text").contains("join") &&
        !col("text").contains("merge") && !col("text").contains("stream") &&
        !col("text").contains("window") && !col("text").contains("agg") &&
        !col("text").contains("vector") && !col("text").contains("scan") &&
        !col("text").contains("filter"))
    assert(noTerm.isEmpty)
  }

  test("rrf fusion: a both-leg doc outranks single-leg docs; contributions integer-exact") {
    import spark.implicits._
    // lex leg ranks docs 10,11,12; sem leg ranks 12,20,21 — doc 12 is
    // the only both-leg doc and must fuse to the top despite holding
    // rank 3 and 1 (RRF's selling point: agreement beats position)
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val sem = Seq((1L, 12L, 1L), (1L, 20L, 2L), (1L, 21L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val out = graft.ops.Retrieval.rrfFusion(lex, sem).collect()
    val top = out.minBy(_.getLong(4))
    assert(top.getLong(1) === 12L, s"both-leg doc not fused to the top: ${out.toSeq}")
    assert(top.getLong(3) === 2L)
    // contributions are exact floor divisions of RrfScale — recompute
    val scale = graft.ops.Retrieval.RrfScale
    assert(top.getLong(2) === scale / 63 + scale / 61)
    val doc10 = out.find(_.getLong(1) == 10L).get
    assert(doc10.getLong(2) === scale / 61 && doc10.getLong(3) === 1L)
  }

  test("q135 hybrid: either leg's top-1 survives fusion; a planted both-leg doc fuses to the top") {
    val out = SparkEntry.queries("q135_hybrid_rrf")(spark, sf).collect()
    assert(out.nonEmpty)
    // a doc ranked top-1 by either leg survives fusion into the top list
    val lexTop = graft.ops.Retrieval.bm25TopK(corpus).collect()
      .filter(_.getAs[Long]("rnk") == 1L)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))).toSet
    assert(lexTop.nonEmpty)
    val fusedPairs = out.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))).toSet
    lexTop.foreach(p => assert(fusedPairs.contains(p),
      s"lexical top-1 $p lost by fusion"))

    // both-leg path, non-vacuously, via a DERIVED corpus (the q116/q126
    // snapshot discipline): plant a doc whose id the SEMANTIC leg
    // already ranks for query 1, with text saturated in query 1's
    // terms — it must fuse with legs = 2 and beat every single-leg doc
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val semHit = graft.ops.AnnPq.ivfPqTopK(emb).collect()
      .filter(r => r.getAs[Long]("query_id") == 1L)
      .minBy(_.getAs[Long]("rnk")).getAs[Long]("neighbor_id")
    import spark.implicits._
    val planted = corpus
      .filter(col("doc_id") =!= semHit)
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((semHit, "hash join merge hash join merge"))
        .toDF("doc_id", "text"))
    val fused = graft.ops.Retrieval.hybridTopK(planted, emb).collect()
      .filter(_.getAs[Long]("query_id") == 1L)
    val hit = fused.find(_.getAs[Long]("doc_id") == semHit).get
    assert(hit.getAs[Long]("legs") === 2L, s"planted doc not on both legs: ${hit}")
    assert(hit.getAs[Long]("rnk") === 1L,
      s"both-leg agreement must outrank single-leg docs: ${fused.toSeq}")
  }

  test("hybrid from stores: equals the in-memory fusion; deletes flow through both legs") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pDir = java.nio.file.Files.createTempDirectory("hybridpost").toString
    val iDir = java.nio.file.Files.createTempDirectory("hybridpq").toString
    Retrieval.writePostingsStore(corpus, pDir)
    graft.ops.AnnPq.writePqIndex(emb, iDir)
    val served = Retrieval.hybridTopKFromStores(spark, pDir, iDir, emb)
      .collect().toSeq
    assert(served === Retrieval.hybridTopK(corpus, emb).collect().toSeq)
    assert(served.nonEmpty)

    // delete a lexical top doc from the postings store: the fused list
    // re-ranks without it, from the SAME stores, no rebuild
    val victim = served.filter(_.getAs[Long]("legs") >= 1L)
      .minBy(_.getAs[Long]("rnk")).getAs[Long]("doc_id")
    import spark.implicits._
    Retrieval.deleteFromPostingsStore(Seq(victim).toDF("doc_id"), pDir)
    graft.ops.AnnPq.deleteFromPqIndex(Seq(victim).toDF("vec_id"), iDir)
    val after = Retrieval.hybridTopKFromStores(spark, pDir, iDir, emb).collect()
    assert(!after.exists(_.getAs[Long]("doc_id") == victim),
      "deleted doc still serves through the fused path")
    assert(after.nonEmpty)
  }

  test("boolean search: AND/NOT semantics hand-checked; repeated terms count once") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join hash join hash"), // both musts (repeats collapse), no not
      (2L, "hash join stream"),         // both musts but the NOT kills it
      (3L, "hash merge"),               // one must missing
      (4L, "vector table"),             // q2 must, no nots
      (5L, "vector scan"),              // q2 must + a NOT
      (6L, "window window")             // q3 (no nots at all)
    ).toDF("doc_id", "text")
    val got = Retrieval.booleanSearch(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 1L), (2L, 4L), (3L, 6L)))
  }

  test("boolean search from the store: bit-equal to the corpus form; deletes are live") {
    val dir = java.nio.file.Files.createTempDirectory("boolstore").toString
    Retrieval.writePostingsStore(corpus, dir)
    val direct = Retrieval.booleanSearch(corpus).collect().toSeq
    assert(direct.nonEmpty, "fixture vacuous: no boolean hits on the corpus")
    assert(Retrieval.booleanSearchFromStore(spark, dir).collect().toSeq === direct)

    // delete one matched doc: the store must serve exactly the corpus
    // form over the survivors — the doc neither matches nor excludes
    val victim = direct.head.getLong(1)
    import spark.implicits._
    Retrieval.deleteFromPostingsStore(Seq(victim).toDF("doc_id"), dir)
    val survivors = corpus.filter(col("doc_id") =!= victim)
    assert(Retrieval.booleanSearchFromStore(spark, dir).collect().toSeq
      === Retrieval.booleanSearch(survivors).collect().toSeq)
  }

  import graft.ops.TextOps

  test("phrase search: planted positions found exactly") {
    val docs = docsDf(Seq(
      1L -> "a b hash join c hash join",
      2L -> "join hash reversed never matches",
      3L -> "hash join",
      4L -> "short"))
    val out = TextOps.phrasePositions(docs, Seq("hash", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((1L, 3L), (1L, 6L), (3L, 1L)))
  }

  test("phrase search: single-token phrase = token positions") {
    val docs = docsDf(Seq(1L -> "x y x"))
    val out = TextOps.phrasePositions(docs, Seq("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((1L, 1L), (1L, 3L)))
  }

  test("phrase search: agrees with substring containment on the real corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val found = TextOps.phrasePositions(docs, Seq("hash", "join"))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    // every found doc truly contains the phrase text
    val withText = docs
      .filter(col("text").contains("hash join"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // token-boundary matches are a subset of substring matches, and on
    // this space-tokenized corpus they coincide
    assert(found === withText)
    assert(found.nonEmpty, "corpus lost its planted phrase")
  }

  test("phrase search: partition-independent") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = TextOps.phrasePositions(docs).collect().toSeq
    val b = TextOps.phrasePositions(docs.repartition(5)).collect().toSeq
    assert(a === b)
  }
}
