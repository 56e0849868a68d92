package graft

import org.apache.spark.sql.functions._

/** Contract for the retrieval operators: BM25 ranking behavior
  * ([[graft.ops.Retrieval.bm25TopK]], q106) and exact positional phrase
  * search ([[graft.ops.TextOps.phrasePositions]], q108).
  */
class RetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import graft.ops.Retrieval

  private def corpus = spark.read.parquet(s"$sf/documents.parquet")

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
    Retrieval.deleteFromPostingsStore(deleted, dir)
    val direct = Retrieval.bm25TopK(survivors).collect().toSeq
    assert(Retrieval.bm25TopKFromStore(spark, dir).collect().toSeq === direct)
    assert(direct.nonEmpty)

    // compact: tombstones folded in — postings and stats bit-equal to an
    // index rebuilt from the survivors, scoring unchanged, log gone
    Retrieval.compactPostingsStore(spark, dir)
    Retrieval.writePostingsStore(survivors, rebuiltDir)
    def postings(d: String) = spark.read.parquet(s"$d/postings")
      .collect().map(_.toSeq).toSet
    def stats(d: String) = spark.read.parquet(s"$d/stats")
      .agg(sum("n_docs"), sum("sum_dl")).collect().map(_.toSeq).toSeq
    assert(postings(dir) === postings(rebuiltDir))
    assert(stats(dir) === stats(rebuiltDir))
    assert(spark.read.parquet(s"$dir/stats").count() === 1L,
      "compaction must collapse the stats partials to one row")
    assert(!new java.io.File(s"$dir/tombstones").exists())
    assert(Retrieval.bm25TopKFromStore(spark, dir).collect().toSeq === direct)
  }

  test("postings store: the query scan is partition-pruned to the terms' buckets") {
    val dir = java.nio.file.Files.createTempDirectory("bm25store").toString
    Retrieval.writePostingsStore(corpus, dir, nBuckets = 16)
    val out = Retrieval.bm25TopKFromStore(spark, dir,
      queries = Seq(1L -> Seq("hash")), nBuckets = 16)
    out.collect() // materialize the AQE final plan
    // the scan's selected partitions must be a strict subset of what
    // exists on disk: only the one term's bucket directory is read
    val allBuckets = new java.io.File(s"$dir/postings").listFiles()
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
