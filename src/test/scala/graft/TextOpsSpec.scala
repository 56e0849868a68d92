package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Unit-level semantics of the text-analysis operators (q30-q33 run the
  * same code against the oracle; these pin the properties the oracle
  * can't see — invariances and plan shape).
  */
class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  test("simhash: identical token sets get identical fingerprints; reorder-invariant") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "delta gamma beta alpha"), // same set, different order
      (2L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val fp = TextOps.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(1L), "simhash must be token-order invariant")
    assert(fp.values.forall(v => v >= 0 && v < (1L << 32)), "fingerprints are 32-bit")
  }

  test("simhash pairs: near-identical docs are found, hamming bounded") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, base),
      (1L, base + " extra"),   // one token added
      (2L, (100 to 140).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = TextOps.simhashPairs(docs, sliceMax = Some(10L), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (a, b, _) => a == 0L && b == 1L },
      "near-identical pair missed")
    assert(pairs.forall(_._3 <= 3))
    assert(!pairs.exists { case (a, b, _) => b == 2L && a <= 1L },
      "unrelated doc matched")
  }

  test("q30 physical plan has no nested-loop or cartesian join") {
    val plan = SparkEntry.queries("q30_simhash")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("langId: profile bigrams drive the prediction, ties break lexicographically") {
    val docs = Seq(
      (0L, "xx", "the then there"),  // th/he/an/in → en
      (1L, "xx", "zhou zhang ngong"),// zh/ng/sh/ia → zh
      (2L, "xx", "qqq")              // no profile bigram: all scores 0 → de (lex first)
    ).toDF("doc_id", "lang", "text")
    val out = TextOps.langId(docs).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(0L) == "en")
    assert(out(1L) == "zh")
    assert(out(2L) == "de")
  }

  test("tokenCounts: BPE-ish regex splits letter/digit/punct runs") {
    val docs = Seq((0L, "ab12 cd, ef!")).toDF("doc_id", "text")
    val r = TextOps.tokenCounts(docs).collect().head
    assert(r.getLong(1) == 3L, "whitespace tokens")
    // ab | 12 | cd | , | ef | !  → 6 BPE-ish tokens
    assert(r.getLong(2) == 6L, "bpeish tokens")
    assert(r.getDouble(3) == 2.0, "12 chars / 6 tokens")
  }

  test("fingerprints: identical docs share fp and count as dups; short docs work") {
    val docs = Seq(
      (0L, "the same document body here"),
      (1L, "the same document body here"),
      (2L, "a completely different text"),
      (3L, "short"), // shorter than k=8 → single truncated window
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.fingerprints(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = out.map(t => t._1 -> t).toMap
    assert(byDoc(0L)._2 == byDoc(1L)._2 && byDoc(0L)._3 == 2L)
    assert(byDoc(2L)._3 == 1L)
    assert(byDoc(3L)._2 != byDoc(4L)._2, "truncated windows still distinguish docs")
  }

  test("fingerprints match a driver-side reference implementation on random texts") {
    // pins the codepoint-array + unrolled-polynomial Spark expression to
    // the declared semantics (min over all k-windows of Σ code·B^(k-1-j)
    // mod P, zero-fill past the end) independently of the DuckDB oracle
    val B = TextOps.FingerprintB; val P = TextOps.FingerprintP
    val k = TextOps.FingerprintK
    def reference(text: String): Long = {
      val codes = text.map(_.toLong)
      val n = math.max(codes.length - (k - 1), 1)
      (1 to n).map { i =>
        (0 until k).foldLeft(0L) { (acc, j) =>
          val c = if (i - 1 + j < codes.length) codes(i - 1 + j) else 0L
          (acc * B + c) % P
        }
      }.min
    }
    val rng = new scala.util.Random(42)
    val texts = (0 until 60).map { i =>
      val len = rng.nextInt(40)
      (i.toLong, (0 until len).map(_ => (32 + rng.nextInt(95)).toChar).mkString)
    }
    val out = TextOps.fingerprints(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, text) =>
      assert(out(id) == reference(text),
        s"doc $id '${text.take(20)}...': spark ${out(id)} != ref ${reference(text)}")
    }
  }

  test("repeatedSpans: intra-doc repeats found with counts; no cross-doc leakage; short docs safe") {
    val docs = Seq(
      // "a b c" occurs twice (positions 1 and 6), overlapping windows distinct
      (0L, "a b c x y a b c d"),
      // the SAME span also appears once here — must NOT merge across docs
      (1L, "a b c unrelated tail"),
      // triple occurrence
      (2L, "p q r p q r p q r"),
      // shorter than the window: zero spans, and no negative-sequence crash
      (3L, "only two"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.repeatedSpans(docs, w = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.count { case (d, s, _) => d == 0L && s == "a b c" } == 1)
    assert(out.find { case (d, s, _) => d == 0L && s == "a b c" }.get._3 == 2L)
    assert(!out.exists(_._1 == 1L), "a span unique within its doc leaked in via another doc")
    // doc 2: "p q r" ×3, plus the bridging spans "q r p" and "r p q" ×2 each
    assert(out.find { case (d, s, _) => d == 2L && s == "p q r" }.get._3 == 3L)
    assert(out.find { case (d, s, _) => d == 2L && s == "q r p" }.get._3 == 2L)
    assert(!out.exists(r => r._1 == 3L || r._1 == 4L))
    // driver-side reference on a random token stream: exact multiset equality
    val rnd = new scala.util.Random(7)
    val toks = Vector.fill(400)(s"t${rnd.nextInt(12)}")
    val expected = toks.sliding(3).map(_.mkString(" ")).toSeq
      .groupBy(identity).collect { case (s, occ) if occ.size > 1 => (9L, s, occ.size.toLong) }
      .toSet
    val got = TextOps.repeatedSpans(
      Seq((9L, toks.mkString(" "))).toDF("doc_id", "text"), w = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("crossDocRemovalSpans: keep-earliest ownership, positions right, intra-doc-only repeats excluded") {
    import spark.implicits._
    val docs = Seq(
      // doc 0 owns "a b c" (earliest); its own repeat stays untouched
      (0L, "a b c x a b c"),
      // doc 1 repeats the owned span twice -> two removal positions
      (1L, "z a b c w a b c"),
      // doc 2: "m n o" repeats ONLY within this doc -> q69's business, not q84's
      (2L, "m n o m n o"),
      // doc 3 shares a span with doc 1 only; owner is doc 1
      (3L, "q r s t"),
      (4L, "r s t u"),
      (5L, "xx")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextOps.crossDocRemovalSpans(docs, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // doc 1: both occurrences of "a b c" flagged, owner 0, 1-based positions
    assert(out.filter(t => t._1 == 1L && t._3 == "a b c")
      .map(t => (t._2, t._4)).sorted.toSeq === Seq((2L, 0L), (6L, 0L)))
    // the owner's occurrences are never removal spans
    assert(!out.exists(_._1 == 0L))
    // intra-doc-only repeats never appear
    assert(!out.exists(_._1 == 2L))
    // "r s t" is shared by docs 3 and 4; doc 3 is the owner
    assert(out.filter(_._1 == 4L).map(t => (t._2, t._3, t._4)).toSeq ===
      Seq((1L, "r s t", 3L)))
    assert(!out.exists(t => t._1 == 3L && t._3 == "r s t"))
    // short docs are silent, not crashing
    assert(!out.exists(_._1 == 5L))
  }

  test("crossDocRemovalSpans is partition-independent") {
    val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val a = graft.ops.TextOps.crossDocRemovalSpans(docs.repartition(1)).collect().toSeq
    val b = graft.ops.TextOps.crossDocRemovalSpans(docs.repartition(7)).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("stripRemovalSpans: covered tokens cut, owner and unique docs untouched, overlaps union") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c x a b c"),          // owner of "a b c": untouched
      (1L, "z a b c w a b c"),        // both occurrences cut (tokens 2-4, 6-8)
      (2L, "m n o m n o"),            // intra-doc repeat only: untouched
      (3L, "q r s t"),                // owner of "q r s"/"r s t": untouched
      (4L, "r s t u"),                // "r s t" cut (tokens 1-3) -> "u"
      (5L, "p q r s t")               // "q r s"+"r s t" overlap: tokens 2-5 cut -> "p"
    ).toDF("doc_id", "text")
    val out = graft.ops.TextOps.stripRemovalSpans(docs, w = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(0L) === ((7L, 0L, "a b c x a b c")))
    assert(out(1L) === ((8L, 6L, "z w")))
    assert(out(2L) === ((6L, 0L, "m n o m n o")))
    assert(out(3L) === ((4L, 0L, "q r s t")))
    assert(out(4L) === ((4L, 3L, "u")))
    assert(out(5L) === ((5L, 4L, "p")))
    assert(out.size === 6) // every doc emitted
  }

  test("stripRemovalSpans is partition-independent and total on the corpus") {
    val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val a = graft.ops.TextOps.stripRemovalSpans(docs.repartition(1)).collect().toSeq
    val b = graft.ops.TextOps.stripRemovalSpans(docs.repartition(7)).collect().toSeq
    assert(a === b)
    assert(a.length.toLong === docs.count())
    // the cut is consistent with the span analysis: removal-span docs lose tokens
    val flagged = graft.ops.TextOps.crossDocRemovalSpans(docs)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val losses = a.map(r => r.getLong(0) -> r.getLong(2)).toMap
    flagged.foreach(d => assert(losses(d) > 0L, s"doc $d flagged but lost nothing"))
    a.foreach(r => if (!flagged(r.getLong(0)))
      assert(r.getLong(2) === 0L, s"doc ${r.getLong(0)} unflagged but cut"))
  }


  test("crossDocRemovalSpans and stripRemovalSpans match a driver-side reference on a random corpus") {
    import spark.implicits._
    // small token alphabet forces dense cross-doc span collisions
    val rnd = new scala.util.Random(11)
    val corpus: Seq[(Long, Vector[String])] =
      (0L until 12L).map(d => d -> Vector.fill(30 + rnd.nextInt(40))(s"w${rnd.nextInt(8)}"))
    val docs = corpus.map { case (d, t) => (d, t.mkString(" ")) }.toDF("doc_id", "text")
    // reference: every 3-token window, ownership by min doc_id
    val spans = corpus.flatMap { case (d, toks) =>
      if (toks.length < 3) Seq.empty
      else toks.sliding(3).zipWithIndex.map { case (w, i) => (d, (i + 1).toLong, w.mkString(" ")) }
    }
    val bySpan = spans.groupBy(_._3).map { case (sp, occ) => sp -> occ.map(_._1) }
    val expRemovals = spans.collect {
      case (d, p, sp) if bySpan(sp).min < bySpan(sp).max && d != bySpan(sp).min =>
        (d, p, sp, bySpan(sp).min)
    }.sortBy(t => (t._1, t._2))
    val gotRemovals = graft.ops.TextOps.crossDocRemovalSpans(docs, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(gotRemovals === expRemovals)
    assert(gotRemovals.nonEmpty, "alphabet too wide; property is vacuous")
    // reference strip: indices covered by any removal, survivors rejoined
    val covByDoc = expRemovals.groupBy(_._1).map { case (d, rs) =>
      d -> rs.flatMap(r => r._2 to (r._2 + 2)).toSet
    }
    val expStrip = corpus.map { case (d, toks) =>
      val cov = covByDoc.getOrElse(d, Set.empty[Long])
      val kept = toks.zipWithIndex.collect { case (t, i) if !cov((i + 1).toLong) => t }
      (d, toks.length.toLong, (toks.length - kept.length).toLong, kept.mkString(" "))
    }.sortBy(_._1)
    val gotStrip = graft.ops.TextOps.stripRemovalSpans(docs, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(gotStrip === expStrip)
    // the property is exercised in both directions on this fixture
    assert(expStrip.exists(_._3 > 0) && expStrip.exists(_._3 == 0))
  }


  test("q84/q88 are total on dirty corpora: null text, empty text, short docs, empty corpus") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType, nullable = true)))
    val rows = Seq(
      org.apache.spark.sql.Row(0L, null),
      org.apache.spark.sql.Row(1L, ""),
      org.apache.spark.sql.Row(2L, "a b"),
      org.apache.spark.sql.Row(3L, "x y z"),
      org.apache.spark.sql.Row(4L, "x y z w"))
    val docs = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val spans = graft.ops.TextOps.crossDocRemovalSpans(docs, w = 3).collect()
    // only the cross-doc repeat survives; null/empty/short docs are silent
    assert(spans.map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq ===
      Seq((4L, 1L, "x y z", 3L)))
    val strip = graft.ops.TextOps.stripRemovalSpans(docs, w = 3).collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1)),
        (if (r.isNullAt(2)) -1L else r.getLong(2)), r.getString(3))).toMap
    assert(strip.size === 5) // TOTAL: every doc emitted, dirty or not
    assert(strip(0L)._3 === "")            // null text -> empty clean_text, no crash
    assert(strip(1L) === ((1L, 0L, "")))   // "" splits to one empty token, kept
    assert(strip(2L) === ((2L, 0L, "a b")))
    assert(strip(3L) === ((3L, 0L, "x y z")))
    assert(strip(4L) === ((4L, 3L, "w")))
    // empty corpus: both operators yield empty, no exceptions
    val none = docs.filter(org.apache.spark.sql.functions.col("doc_id") < 0)
    assert(graft.ops.TextOps.crossDocRemovalSpans(none).collect().isEmpty)
    assert(graft.ops.TextOps.stripRemovalSpans(none).collect().isEmpty)
  }

  test("q99 subword count: greedy longest-match by hand, null/empty totality") {
    // vocab grows from the corpus: 'hello' appears twice, so its grams
    // dominate; 8 grams = el,he,hel,ld,ell,ello,hell,hello (count desc,
    // gram asc) — hand-checked against the DuckDB prototype
    val docs = Seq(
      (0L, "hello hello world"),
      (1L, "held worldly"),
      (2L, ""),
      (3L, null.asInstanceOf[String]),
      (4L, "a  b") // double space: no empty-word tokens
    ).toDF("doc_id", "text")
    val vocab = TextOps.subwordVocab(docs, vocabSize = 8)
    assert(vocab.toSet === Set("el", "he", "hel", "ld", "ell", "ello", "hell", "hello"), vocab)
    val out = TextOps.subwordTokenCounts(docs, vocabSize = 8).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // doc 0: [hello][hello] + w,o,r,[ld] = 2 + 4 = 6
    assert(out(0L) === Some(6L))
    // doc 1: [hel]d -> [hel][d]; worldly -> w,o,r,[ld],l,y = 2 + 6 = 8
    assert(out(1L) === Some(8L))
    assert(out(2L) === Some(0L))
    assert(out(3L) === None)
    assert(out(4L) === Some(2L))
  }

  test("q99 A/B: a token budget denominated in subword tokens selects a different set") {
    val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val vocab = TextOps.subwordVocab(docs)
    val ws = graft.ops.TrainPipe.budgetSample(docs)
      .collect().map(_.getLong(0)).toSet
    val sw = graft.ops.TrainPipe.budgetSample(docs, subwordVocab = Some(vocab))
      .collect().map(_.getLong(0)).toSet
    assert(ws.nonEmpty && sw.nonEmpty)
    assert(ws !== sw,
      "whitespace and subword budgets selected identical documents — " +
        "the proxy would be indistinguishable and the denominator option moot")
  }

  test("q99 plan: counting is a pure per-row map — no join, no window, no aggregate") {
    val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val plan = TextOps.subwordTokenCounts(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bpe_token_count"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("HashAggregate"), plan)
  }

  test("q101 chunking: hand-checked windows, overlap + coverage properties, short/empty docs") {
    // 10 tokens, chunkTokens=4, overlap=1 (stride 3):
    // n_chunks = 1 + ceil((10-4)/3) = 3 -> [t0..t3][t3..t6][t6..t9]
    val toks = (0 until 10).map(i => s"t$i")
    val docs = Seq(
      (0L, toks.mkString(" ")),
      (1L, "a b c"), // n <= chunkTokens: one chunk, whole doc
      (2L, "")       // empty text: one chunk, one empty token
    ).toDF("doc_id", "text")
    val out = TextOps.chunkWindows(docs, chunkTokens = 4, overlap = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    assert(out((0L, 0L)) === ((4L, "t0 t1 t2 t3")))
    assert(out((0L, 1L)) === ((4L, "t3 t4 t5 t6")))
    assert(out((0L, 2L)) === ((4L, "t6 t7 t8 t9")))
    assert(out((1L, 0L)) === ((3L, "a b c")))
    assert(out((2L, 0L)) === ((1L, "")))
    assert(out.size === 5)
    // properties on the real corpus: consecutive chunks share exactly
    // `overlap` tokens, and dropping each chunk's leading overlap past
    // chunk 0 reassembles the original token stream
    val corpus = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val chunks = TextOps.chunkWindows(corpus, chunkTokens = 32, overlap = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(_._2).map(_._3.split(" ", -1).toSeq).toSeq).toMap
    val original = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (docId, cs) =>
      cs.sliding(2).foreach {
        case Seq(a, b) => assert(a.takeRight(8) === b.take(8), s"doc $docId overlap")
        case _ =>
      }
      val reassembled = (cs.head ++ cs.tail.flatMap(_.drop(8))).mkString(" ")
      assert(reassembled === original(docId), s"doc $docId coverage")
    }
  }

  test("q114 tf-idf: a corpus-rare term outranks ubiquitous terms within a doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common common rare rare"),
      (2L, "common filler words here"),
      (3L, "common another doc text"),
      (4L, "common more filler text")).toDF("doc_id", "text")
    val out = TextOps.tfidfKeywords(docs, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 'common' appears in every doc (idf = ln(2) ~ 0.69, score 3x = 2.08M);
    // 'rare' in one doc only (idf = ln(5) ~ 1.61, score 2x = 3.22M) — rare wins
    assert(out(1L) === "rare")
  }

  test("q114 tf-idf: partition-independent on the real corpus") {
    val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val a = TextOps.tfidfKeywords(docs).collect().map(_.toSeq).toSeq
    val b = TextOps.tfidfKeywords(docs.repartition(9)).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("q121 co-occurrence: hand-checked pair counts, distinct within doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b a b c"),       // distinct sorted: a b c -> (a,b) (a,c) (b,c)
      (2L, "a b"),           // (a,b)
      (3L, "c a")).toDF("doc_id", "text")  // (a,c)
    val out = TextOps.cooccurrenceTopK(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("a", "b") -> 2L, ("a", "c") -> 2L, ("b", "c") -> 1L))
  }

  test("q121 co-occurrence: maxTokens cap bounds pair generation") {
    import spark.implicits._
    val wide = Seq((1L, (0 until 100).map(i => f"t$i%03d").mkString(" ")))
      .toDF("doc_id", "text")
    // cap 5 -> exactly C(5,2) = 10 pairs from the first 5 sorted tokens
    val out = TextOps.cooccurrenceTopK(wide, k = 100, maxTokens = 5).collect()
    assert(out.length === 10)
    assert(out.forall(r => r.getString(0) < "t005" && r.getString(1) < "t005"))
  }

  test("q121 co-occurrence: partition-independent on the real corpus") {
    val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val a = TextOps.cooccurrenceTopK(docs).collect().map(_.toSeq).toSeq
    val b = TextOps.cooccurrenceTopK(docs.repartition(9)).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  // -------------------------------------------------- BPE training (q145)

  /** The ACL-2016 paper's corpus (word frequencies chosen so ties
    * exercise the deterministic break): low:5 lower:2 newest:6 widest:3.
    */
  private def bpeCorpus = {
    import spark.implicits._
    (Seq.fill(5)("low").zipWithIndex.map { case (w, i) => (i.toLong, w) } ++
      Seq.fill(2)("lower").zipWithIndex.map { case (w, i) => (100L + i, w) } ++
      Seq.fill(6)("newest").zipWithIndex.map { case (w, i) => (200L + i, w) } ++
      Seq.fill(3)("widest").zipWithIndex.map { case (w, i) => (300L + i, w) })
      .toDF("doc_id", "text")
  }

  test("bpe merges: the published example learns es, est, lo, low in order") {
    // step 1: es=9 ties st=9 -> 'es' wins (pair asc); step 2: (es,t)=9;
    // step 3: lo=7 ties ow=7 -> 'lo'; step 4: (lo,w)=7
    val merges = TextOps.bpeMerges(bpeCorpus, nMerges = 4)
    assert(merges === Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("bpe merges: stops early when no pair reaches minCount") {
    import spark.implicits._
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // every pair occurs once; minCount=2 learns nothing
    assert(TextOps.bpeMerges(tiny, nMerges = 3).isEmpty)
    // minCount=1 learns deterministically (pair asc on all-ties)
    val m = TextOps.bpeMerges(tiny, nMerges = 1, minCount = 1L)
    assert(m === Seq((1, "a", "b", 1L)))
  }

  // ------------------------------------------------ BPE apply (q163/q164)

  test("bpe apply: trained merges segment the ACL corpus as published") {
    val merges = TextOps.bpeMerges(bpeCorpus, nMerges = 4)
      .map(m => (m._2, m._3))
    val segs = TextOps.bpeEncodeWords(bpeCorpus, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    // es+est then lo+low: "lowest" would be [low, est]; the corpus's own
    // words segment with the learned units
    assert(segs("low") === Seq("low"))
    assert(segs("lower") === Seq("low", "e", "r"))
    assert(segs("newest") === Seq("n", "e", "w", "est"))
    assert(segs("widest") === Seq("w", "i", "d", "est"))
  }

  test("bpe apply: greedy left-to-right parity with the trainer's fold") {
    import spark.implicits._
    // (a, a) applied to aaaaa must give [aa, aa, a] — the fold, not a
    // re-scan that would pair the tail differently
    val d = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val segs = TextOps.bpeEncodeWords(d, Seq(("a", "a")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(segs("aaaaa") === Seq("aa", "aa", "a"))
    // adjacent non-overlapping occurrences all merge in rank order:
    // (a,b) over abab -> [ab, ab]; then (ab,ab) -> [abab]
    val d2 = Seq((1L, "abab")).toDF("doc_id", "text")
    assert(TextOps.bpeEncodeWords(d2, Seq(("a", "b")))
      .head().getSeq[String](2) === Seq("ab", "ab"))
    assert(TextOps.bpeEncodeWords(d2, Seq(("a", "b"), ("ab", "ab")))
      .head().getSeq[String](2) === Seq("abab"))
  }

  test("bpe apply: merge-rank segmentation differs from the q99 n-gram proxy") {
    import spark.implicits._
    // "the" under trained ranks (t,h),(th,e): ONE token [the].
    // The q99 greedy proxy with vocabulary [he] matches longest n-grams
    // left to right: t + he = TWO tokens. Same string, different
    // tokenizers — the reason budgets must be denominated in the
    // TRAINED tokenizer (q164), not the proxy.
    val d = Seq((1L, "the")).toDF("doc_id", "text")
    val bpe = TextOps.bpeTokenCounts(d, Seq(("t", "h"), ("th", "e")))
      .head().getLong(1)
    val proxy = d.select(graft.functions.TextFunctions
      .bpeTokenCount(col("text"), Seq("he"))).head().getLong(0)
    assert(bpe === 1L)
    assert(proxy === 2L)
  }

  test("bpeTokenCountCol (per-row apply) is bit-equal to the join-based batch counts") {
    import spark.implicits._
    val merges = TextOps.bpeMerges(bpeCorpus, nMerges = 4)
      .map(m => (m._2, m._3))
    val dirty = bpeCorpus.unionByName(Seq(
      (900L, null: String), (901L, ""), (902L, "  low   newest "))
      .toDF("doc_id", "text"))
    val viaJoin = TextOps.bpeTokenCounts(dirty, merges)
      .select("doc_id", "n_tokens_bpe")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perRow = dirty.select(col("doc_id"),
      TextOps.bpeTokenCountCol(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow === viaJoin)
    // and the empty merge chain degrades to per-word char counts
    assert(Seq(("ab cde")).toDF("text")
      .select(TextOps.bpeTokenCountCol(col("text"), Seq.empty))
      .head().getLong(0) === 5L)
  }

  test("bpe token counts: total over null/empty text; delimiter guarded") {
    import spark.implicits._
    val d = Seq((1L, Some("low low")), (2L, None: Option[String]),
      (3L, Some(""))).toDF("doc_id", "text")
    val rows = TextOps.bpeTokenCounts(d, Seq(("l", "o"), ("lo", "w")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows === Array((1L, 2L, 2L), (2L, 0L, 0L), (3L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      TextOps.bpeEncodeWords(d, Seq(("a", TextOps.SymSep)))
    }
  }

  test("bpe pair counting: every adjacent occurrence counts (aaaa -> 3)") {
    import spark.implicits._
    val d = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val top = TextOps.bpePairCounts(d, topN = 5).collect()
    assert(top.length === 1)
    assert(top(0).getString(0) === "a a" && top(0).getLong(1) === 3L)
    // after merging (a,a) the word is [aa, aa]: greedy left-to-right
    val m = TextOps.bpeMerges(d, nMerges = 2, minCount = 1L)
    assert(m.head === ((1, "a", "a", 3L)))
    assert(m(1) === ((2, "aa", "aa", 1L)))
  }

  test("q145 pair counts match on the real corpus under repartitioning") {
    val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val a = TextOps.bpePairCounts(docs).collect().map(_.toSeq).toSeq
    val b = TextOps.bpePairCounts(docs.repartition(7)).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("extractText: boilerplate tags stripped, body kept, density and length rules") {
    import spark.implicits._
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val html =
      "<html><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/t\">Topics</a></nav>" +
        "<p>" + body + "</p>" +
        "<p>Share: <a href=\"/fb\">Facebook</a> <a href=\"/tw\">Twitter</a> <a href=\"/rss\">RSS</a></p>" +
        "<p>ok</p>" +
        "<footer>(c) 2026 <a href=\"/tos\">Terms</a></footer>" +
        "</body></html>"
    val out = TextOps.extractText(Seq((1L, html)).toDF("doc_id", "raw_html"))
      .collect().head
    assert(out.getString(1) === body, "article body must survive intact")
    assert(out.getLong(2) === 1L, "exactly the body block is kept")
    assert(out.getLong(3) === 4L, "nav, share bar, short block, footer dropped")
  }

  test("extractText: non-HTML passthrough is total (plain text, empty, null)") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some("just a plain sentence with no markup at all")),
      (2L, Some("")),
      (3L, None: Option[String]),
      // stray inline tag but NO block tags: tags stripped, text kept whole
      (4L, Some("some <b>bold</b> text")))
      .toDF("doc_id", "raw_html")
    val rows = TextOps.extractText(docs).collect()
    assert(rows(0).getString(1) === "just a plain sentence with no markup at all")
    assert(rows(1).getString(1) === "")
    assert(rows(2).getString(1) === "")
    assert(rows(3).getString(1) === "some bold text")
    rows.foreach { r =>
      assert(r.getLong(2) === 0L && r.getLong(3) === 0L,
        "passthrough rows classify no blocks")
    }
  }

  test("extractText: a long low-link aside is still boilerplate by tag") {
    import spark.implicits._
    val aside = "<aside>" + ("sponsored words here " * 5).trim + "</aside>"
    val html = "<p>short</p>" + aside
    val out = TextOps.extractText(Seq((1L, html)).toDF("doc_id", "raw_html"))
      .collect().head
    assert(out.getString(1) === "", "aside dropped by TAG even when long and linkless")
    assert(out.getLong(3) === 2L)
  }
}
