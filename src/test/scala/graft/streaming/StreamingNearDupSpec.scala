package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextOps

/** Streaming SimHash near-dup: per-row fingerprint parity with the batch
  * aggregate, batch-mode pair parity with simhashPairs, cross-batch state
  * carry with exactly-once matching, watermark expiry of old state, and
  * the hot-bucket cap.
  */
class StreamingNearDupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("simhashColumn is bit-identical to the batch simhash aggregate") {
    val docs = graft.Queries.t(spark, sf, "documents")
    val batch = TextOps.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perRow = docs
      .select(col("doc_id"), TextOps.simhashColumn(col("text")).as("fp"))
      .filter(col("fp").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow.keySet == batch.keySet)
    perRow.foreach { case (id, fp) =>
      assert(fp == batch(id), s"doc $id: per-row fp $fp != batch ${batch(id)}")
    }
    assert(batch.nonEmpty)
  }

  test("batch-mode streamingNearDup emits exactly the simhashPairs pairs") {
    val docs = graft.Queries.t(spark, sf, "documents")
      .withColumn("ts",
        timestamp_seconds(lit(1704067200L) + col("doc_id"))) // ts order == id order
    val matches = StreamingEtl.streamingNearDup(docs)
      .collect()
      .map(m => (m.dup_of, m.doc_id)) // dup_of arrived earlier => smaller id
      .toSet
    val batch = TextOps.simhashPairs(
      graft.Queries.t(spark, sf, "documents"), sliceMax = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matches == batch,
      s"missing=${(batch -- matches).take(5)} extra=${(matches -- batch).take(5)}")
    assert(batch.nonEmpty, "no near-dup pairs in test corpus?")
  }

  test("state carries across micro-batches; a cross-batch near-dup matches exactly once") {
    import org.apache.spark.sql.types._
    val in = tmpDir("snd-in"); val out = tmpDir("snd-out"); val ckpt = tmpDir("snd-ckpt")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")

    def drain(): Unit = {
      val matches = StreamingEtl.streamingNearDup(
        StreamingEtl.jsonFileStream(spark, in.toString, schema))
      val q = matches.toDF().writeStream
        .format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writeFile(in, "b1.json",
      s"""{"doc_id":1,"ts":"2024-01-01T10:00:00.000Z","text":"$base"}
         |{"doc_id":2,"ts":"2024-01-01T10:01:00.000Z","text":"${(100 to 140).map(i => s"other$i").mkString(" ")}"}
         |""".stripMargin)
    drain()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("dup_of", LongType),
      StructField("hamming", LongType)))
    def results() = spark.read.schema(outSchema).parquet(out.toString)
      .select("doc_id", "dup_of").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(results().isEmpty, "unrelated docs matched in batch 1")

    // batch 2: near-identical to doc 1 (one token appended) arrives later,
    // within the watermark horizon -> matched against batch-1 state
    writeFile(in, "b2.json",
      s"""{"doc_id":3,"ts":"2024-01-01T10:05:00.000Z","text":"$base extra"}
         |""".stripMargin)
    drain()
    assert(results() == Set((3L, 1L)), results().toString)

    // re-drain with nothing new: exactly-once, no re-emission
    drain()
    assert(results() == Set((3L, 1L)))
  }

  test("watermark expires old state: a match beyond the horizon is not emitted") {
    import org.apache.spark.sql.types._
    val in = tmpDir("sndw-in"); val out = tmpDir("sndw-out"); val ckpt = tmpDir("sndw-ckpt")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")

    def drain(): Unit = {
      val matches = StreamingEtl.streamingNearDup(
        StreamingEtl.jsonFileStream(spark, in.toString, schema), watermarkDelay = "10 minutes")
      val q = matches.toDF().writeStream
        .format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writeFile(in, "b1.json",
      s"""{"doc_id":1,"ts":"2024-01-01T10:00:00.000Z","text":"$base"}
         |""".stripMargin)
    drain()
    // batch 2 advances the watermark far past doc 1 (event at 12:00,
    // delay 10 min -> watermark 11:50 at batch end)
    writeFile(in, "b2.json",
      s"""{"doc_id":2,"ts":"2024-01-01T12:00:00.000Z","text":"${(100 to 140).map(i => s"other$i").mkString(" ")}"}
         |""".stripMargin)
    drain()
    // batch 3: near-dup of doc 1, but doc 1's state is beyond the horizon
    writeFile(in, "b3.json",
      s"""{"doc_id":3,"ts":"2024-01-01T12:01:00.000Z","text":"$base extra"}
         |""".stripMargin)
    drain()
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("dup_of", LongType),
      StructField("hamming", LongType)))
    val res = spark.read.schema(outSchema).parquet(out.toString).collect()
    assert(res.isEmpty, s"expired state still matched: ${res.mkString(",")}")
  }

  test("batch-mode streamingEmbedNearDup emits exactly the nearDupPairs pairs+cosines") {
    val emb = graft.Queries.t(spark, sf, "embeddings")
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("vec_id")))
    val matches = StreamingEtl.streamingEmbedNearDup(emb)
      .collect()
      .map(m => (m.dup_of, m.vec_id, m.cosine)) // dup_of earlier => smaller id
      .toSet
    val batch = graft.ops.AnnLsh.nearDupPairs(
      graft.Queries.t(spark, sf, "embeddings"), sliceMax = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(matches == batch,
      s"missing=${(batch -- matches).take(3)} extra=${(matches -- batch).take(3)}")
    assert(batch.nonEmpty, "no embedding near-dups in test corpus?")
  }

  test("degenerate embeddings (zero-norm, dim mismatch) are dropped, never query-killing") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000)
    val rows = Seq(
      (1L, t(1), Seq.fill(64)(1.0f)), // genuine near-dup pair...
      (2L, t(2), Seq.fill(64)(1.0f)), // ...identical -> cosine 1.0
      (3L, t(3), Seq.fill(64)(0.0f)), // zero-norm: 0/0 cosine is NaN
      (4L, t(4), Seq.fill(32)(1.0f)) // dim mismatch vs the 64-dim corpus
    ).toDF("vec_id", "ts", "embedding")
    // pre-fix, the zero-norm comparison crashed the whole query
    // (BigDecimal.valueOf(NaN) throws) and the short vector silently
    // truncated the dot to the common prefix, inventing matches the
    // batch operator (NULL-padded zip_with dot) never emits — both must
    // simply drop, leaving exactly the one genuine pair
    val out = StreamingEtl.streamingEmbedNearDup(rows, dim = 64, threshold = 0.3)
      .collect()
    assert(out.map(m => (m.dup_of, m.vec_id, m.cosine)).toSet == Set((1L, 2L, 1.0)),
      s"got: ${out.toSeq}")
  }

  test("streamingEmbedNearDup carries vector state across micro-batches") {
    import org.apache.spark.sql.types._
    val in = tmpDir("sev-in"); val out = tmpDir("sev-out"); val ckpt = tmpDir("sev-ckpt")
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("ts", TimestampType),
      StructField("embedding", ArrayType(FloatType))))
    def vec(xs: Double*): String = xs.mkString("[", ",", "]")
    val dim = 4

    def drain(): Unit = {
      val matches = StreamingEtl.streamingEmbedNearDup(
        StreamingEtl.jsonFileStream(spark, in.toString, schema),
        dim = dim, threshold = 0.9)
      val q = matches.toDF().writeStream
        .format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // batch 1: two orthogonal vectors (no match)
    writeFile(in, "b1.json",
      s"""{"vec_id":1,"ts":"2024-01-01T10:00:00.000Z","embedding":${vec(1, 0, 0, 0)}}
         |{"vec_id":2,"ts":"2024-01-01T10:01:00.000Z","embedding":${vec(0, 1, 0, 0)}}
         |""".stripMargin)
    drain()
    // batch 2: near-parallel to vec 1 -> cross-batch match against state
    writeFile(in, "b2.json",
      s"""{"vec_id":3,"ts":"2024-01-01T10:05:00.000Z","embedding":${vec(0.99, 0.01, 0, 0)}}
         |""".stripMargin)
    drain()
    val outSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("dup_of", LongType),
      StructField("cosine", DoubleType)))
    val res = spark.read.schema(outSchema).parquet(out.toString)
      .select("vec_id", "dup_of").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res == Set((3L, 1L)), res.toString)
  }

  test("NewestK bounds size during insertion and retains the newest cap entries, any order") {
    final case class E(id: Long, ts: Long)
    val cap = 4
    val all = (1L to 16L).map(i => E(i, 1000L + i))
    val expected = all.sortBy(e => (-e.ts, e.id)).take(cap)
    val orders = Seq(
      all,                                  // ascending ts
      all.reverse,                          // descending ts
      new scala.util.Random(7).shuffle(all) // arbitrary
    )
    orders.foreach { order =>
      val buf = new StreamingEtl.NewestK[E](cap, _.ts, _.id)
      order.foreach { e =>
        buf.insert(e)
        assert(buf.size <= cap, s"size ${buf.size} exceeded cap during insertion")
      }
      assert(buf.toSeq == expected,
        s"order ${order.map(_.id).mkString(",")}: got ${buf.toSeq.map(_.id)}")
    }
    // ties on ts: smaller id wins
    val tied = Seq(E(5, 100L), E(3, 100L), E(9, 100L), E(1, 100L), E(7, 100L), E(2, 100L))
    val bufT = new StreamingEtl.NewestK[E](3, _.ts, _.id)
    tied.foreach(bufT.insert)
    assert(bufT.toSeq.map(_.id) == Seq(1L, 2L, 3L))
  }

  test("one hot bucket in a single batch: compares stay O(N x cap), not O(N^2)") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val n = 16; val cap = 4
    // n identical texts -> identical fingerprints -> one hot bucket in
    // every band; batch-parity mode (state starts empty, whole bucket in
    // ONE invocation) is exactly where the cap previously never bound
    val docs = (1 to n).map(i => (i.toLong, base)).toDF("doc_id", "text")
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("doc_id")))
    val rows = StreamingEtl.streamingNearDup(docs, maxPerBucket = cap).collect()
    val bands = graft.ops.TextOps.SimHashBands
    // bounded processing: arrival i compares against <= cap entries
    val boundedMax = bands * ((0 until n).map(i => math.min(i, cap)).sum)
    val unbounded = bands * n * (n - 1) / 2
    assert(rows.length <= boundedMax,
      s"${rows.length} emissions > bounded max $boundedMax (unbounded would be $unbounded)")
    assert(rows.length < unbounded)
    // recall: the cap prunes comparisons, not docs — every doc still
    // participates in at least one emitted pair
    val seen = rows.flatMap(m => Seq(m.doc_id, m.dup_of)).toSet
    assert(seen == (1L to n.toLong).toSet, s"docs missing: ${(1L to n.toLong).toSet -- seen}")
    rows.foreach(m => assert(m.dup_of < m.doc_id, s"orientation: $m"))
  }

  test("one hot embedding bucket in a single batch stays bounded") {
    import spark.implicits._
    val n = 16; val cap = 4; val dim = 4
    val docs = (1 to n).map(i => (i.toLong, Seq(1f, 0.5f, 0.25f, 0.125f)))
      .toDF("vec_id", "embedding")
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("vec_id")))
    val rows = StreamingEtl.streamingEmbedNearDup(
      docs, dim = dim, threshold = 0.9, maxPerBucket = cap).collect()
    val tables = 16 // AnnLsh.bucketArray L
    val boundedMax = tables * ((0 until n).map(i => math.min(i, cap)).sum)
    val unbounded = tables * n * (n - 1) / 2
    assert(rows.length <= boundedMax,
      s"${rows.length} emissions > bounded max $boundedMax (unbounded would be $unbounded)")
    val seen = rows.flatMap(m => Seq(m.vec_id, m.dup_of)).toSet
    assert(seen == (1L to n.toLong).toSet)
    rows.foreach { m =>
      assert(m.dup_of < m.vec_id, s"orientation: $m")
      assert(m.cosine == 1.0, s"identical vectors must have cosine 1.0: $m")
    }
  }

  test("within-cap output is independent of arrival order (orientation is canonical)") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    // three mutually-near-dup docs + one unrelated, well under the cap
    val rows = Seq(
      (1L, base), (2L, base + " extra"), (3L, base + " extra2"),
      (4L, (100 to 140).map(i => s"other$i").mkString(" ")))
    def run(order: Seq[(Long, String)], partitions: Int): Set[(Long, Long)] = {
      val df = order.toDF("doc_id", "text")
        .repartition(partitions) // perturb physical arrival order too
        .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("doc_id")))
      StreamingEtl.streamingNearDup(df).collect()
        .map(m => (m.dup_of, m.doc_id)).toSet
    }
    val expected = run(rows, 1)
    assert(expected.nonEmpty)
    assert(run(rows.reverse, 1) == expected, "reversed input changed the output set")
    assert(run(new scala.util.Random(3).shuffle(rows), 4) == expected,
      "shuffled/multi-partition input changed the output set")
    expected.foreach { case (dupOf, docId) =>
      assert(dupOf < docId, "orientation must follow event time (earlier = dup_of)")
    }
  }

  test("maxPerBucket caps state and comparisons; matches through other bands survive") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base + " extra"))
      .toDF("doc_id", "text")
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("doc_id")))
    // cap of 1: each bucket holds only the newest entry; docs 1 and 2
    // share all 4 bands, and doc 1 is the sole (newest) entry everywhere,
    // so the pair still matches
    val matches = StreamingEtl.streamingNearDup(docs, maxPerBucket = 1)
      .collect().map(m => (m.doc_id, m.dup_of)).distinct
    assert(matches.toSet == Set((2L, 1L)), matches.mkString(","))
  }
}
