package graft

import org.apache.spark.sql.functions._

import graft.ops.TrainPipe

/** Contracts for the training-pipeline composition operators
  * (q70 packing / q71 decontamination / q72 mixture sampling); the
  * DuckDB hash-compare is the cross-engine gate, these pin the
  * algebraic and physical properties.
  */
class TrainPipeSpec extends SparkSpec {

  private lazy val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")

  test("packing: offsets are exact running sums and chunks cover the doc span") {
    val out = TrainPipe.packSequences(docs, contextLen = 64, shards = 4)
      .collect()
    assert(out.nonEmpty)
    // per shard: rows in doc_id order have tok_offset == sum of previous
    // n_tokens, and chunk ids are the straddle arithmetic of that span
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      var run = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(3) === run, s"offset mismatch at doc ${r.getLong(0)}")
        run += r.getLong(2)
        assert(r.getLong(4) === r.getLong(3) / 64)
        assert(r.getLong(5) === (r.getLong(3) + r.getLong(2) - 1) / 64)
        assert(r.getLong(4) <= r.getLong(5))
      }
    }
    // shard is doc-hash-derived: every doc appears exactly once
    assert(out.map(_.getLong(0)).distinct.length === out.length)
  }

  test("packing is partition-independent (same result at 1 and 7 partitions)") {
    val a = TrainPipe.packSequences(docs.repartition(1)).collect().toSeq
    val b = TrainPipe.packSequences(docs.repartition(7)).collect().toSeq
    assert(a === b)
  }

  test("decontamination: a planted copy of a held-out doc hits on every gram") {
    import spark.implicits._
    val base = Seq(
      (0L, "alpha beta gamma delta epsilon"), // held-out (0 % 10 == 0)
      (1L, "alpha beta gamma delta epsilon"), // exact copy -> all grams hit
      (2L, "zeta eta theta iota kappa"))      // disjoint -> zero hits
      .toDF("doc_id", "text")
    val out = TrainPipe.decontaminate(base).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val copy = out(0)
    assert(copy.getLong(1) === 3L) // 5 tokens -> 3 distinct 3-grams
    assert(copy.getLong(2) === copy.getLong(1)) // every gram contaminated
    assert(out(1).getLong(2) === 0L)
  }

  test("decontamination plan: held-out gram set is broadcast") {
    val plan = TrainPipe.decontaminate(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("bloom decontamination matches the exact broadcast form bit-for-bit") {
    val exact = TrainPipe.decontaminate(docs).collect().toSeq
    val bloom = TrainPipe.decontaminateBloom(docs).collect().toSeq
    assert(bloom === exact)
    // the at-scale verify shape (shuffle join of the positive sliver)
    // must answer identically too
    val shuffled = TrainPipe
      .decontaminateBloom(docs, verifyBroadcast = false).collect().toSeq
    assert(shuffled === exact)
  }

  test("bloom decontamination: planted copy hits; empty held-out set is total") {
    import spark.implicits._
    val base = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val out = TrainPipe.decontaminateBloom(base).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out(0).getLong(2) === out(0).getLong(1)) // copy: every gram hit
    assert(out(1).getLong(2) === 0L)                // disjoint: none
    // no doc_id % 10 == 0 docs -> no sketch -> every corpus gram clean
    val none = TrainPipe.decontaminateBloom(base.filter(col("doc_id") =!= 0))
      .collect()
    assert(none.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(none.forall(_.getLong(2) === 0L))
  }

  test("bloom decontamination plan: codegen'd might_contain prefilter + broadcast verify") {
    val df = TrainPipe.decontaminateBloom(docs)
    df.collect() // resolve AQE so the final physical plan is inspectable
    // the physical plan's simpleString elides long Project expression
    // lists, so pin the prefilter on the optimized logical plan and the
    // join strategy on the physical one
    val logical = df.queryExecution.optimizedPlan.toString
    assert(logical.contains("might_contain"), logical)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("mixture sample: deterministic, partition-independent, rate-ordered") {
    val a = TrainPipe.mixtureSample(docs.repartition(1)).collect().toSeq
    val b = TrainPipe.mixtureSample(docs.repartition(5)).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
    // fr samples at 100%: every fr doc is kept; zh at 10%: fewer than half
    val frAll = docs.filter(col("lang") === "fr").count()
    assert(a.count(_.getString(1) == "fr").toLong === frAll)
    val zhAll = docs.filter(col("lang") === "zh").count()
    assert(a.count(_.getString(1) == "zh").toLong <= zhAll / 2)
    // a language with no rate is dropped entirely
    val none = TrainPipe.mixtureSample(docs, rates = Seq("fr" -> 10000))
      .select("lang").distinct().collect().map(_.getString(0)).toSeq
    assert(none === Seq("fr"))
  }

  test("mixture sample plan: no shuffle before the output sort") {
    val df = TrainPipe.mixtureSample(docs)
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // exactly the range exchange of the final orderBy, nothing else
    assert(exchanges.length <= 1, df.queryExecution.executedPlan.toString)
  }

  test("budget sample: deterministic, keeps small languages whole, strictly downsamples big ones") {
    val budget = 200L
    val a = TrainPipe.budgetSample(docs, budgetTokens = budget).collect()
    val b = TrainPipe.budgetSample(docs.repartition(7), budgetTokens = budget)
      .collect()
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
    val kept = a.groupBy(_.getString(1))
      .map { case (l, rs) => l -> rs.map(_.getLong(2)).sum }
    val totals = docs
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, tot) =>
      if (tot <= budget)
        assert(kept.getOrElse(lang, 0L) === tot, s"$lang under budget must keep all")
      else
        assert(kept.getOrElse(lang, 0L) < tot, s"$lang over budget must shed tokens")
    }
  }

  test("budget denominated in trained-tokenizer tokens differs materially from the whitespace proxy") {
    // the q164 point: every whitespace word is AT LEAST one subword
    // token (usually several under only 8 merges), so tokenizer totals
    // exceed whitespace totals, the keep test tightens, and the SAME
    // budget admits a strictly smaller document set — exactly the
    // over-admission a proxy-denominated budget hides
    val merges = graft.ops.TextOps.bpeMerges(docs, nMerges = 8)
      .map(m => (m._2, m._3))
    assert(merges.nonEmpty)
    val ws = TrainPipe.budgetSample(docs, budgetTokens = 300L)
      .collect().map(_.getLong(0)).toSet
    val bpe = TrainPipe.budgetSample(docs, budgetTokens = 300L,
      merges = Some(merges))
      .collect().map(_.getLong(0)).toSet
    assert(bpe !== ws, "denominators selected identical documents")
    // keep probability scales with budget/total and totals only grow
    // under subword splitting, so the tokenizer selection is a subset
    assert(bpe.subsetOf(ws))
    assert(bpe.nonEmpty && ws.nonEmpty)
    // and the reported n_tokens really are the tokenizer's, not ws
    val perDoc = graft.ops.TextOps.bpeTokenCounts(docs, merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    perDoc.values.foreach { case (nb, nw) => assert(nb >= nw) }
    assert(perDoc.values.exists { case (nb, nw) => nb > nw })
  }

  test("budget sample plan: totals broadcast, no window / ordered prefix scan") {
    val df = TrainPipe.budgetSample(docs)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("mixture sample is subset-consistent: a re-run over a grown corpus keeps every prior selection") {
    // membership is a pure function of (doc_id, lang), so ingesting new
    // docs must not change any existing doc's fate — the incremental
    // property the operator's Scaladoc claims
    val offset = 1000000L
    val grown = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + offset))
    val base = TrainPipe.mixtureSample(docs).collect().toSeq
    val rerun = TrainPipe.mixtureSample(grown)
      .filter(col("doc_id") < offset).collect().toSeq
    assert(rerun === base)
  }

  test("budget sample is subset-consistent: selections over a grown corpus are a subset of the prior run's") {
    // keep iff bucket * total < budget * 10000 — totals only GROW as the
    // corpus grows, so the per-doc test only gets stricter: any doc kept
    // on the superset run must have been kept on the base run (rates
    // shrink monotonically; no doc ever flips from dropped to kept)
    val offset = 1000000L
    val grown = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + offset))
    val budget = 500L
    val base = TrainPipe.budgetSample(docs, budgetTokens = budget)
      .collect().map(_.getLong(0)).toSet
    val rerunOnBase = TrainPipe.budgetSample(grown, budgetTokens = budget)
      .filter(col("doc_id") < offset)
      .collect().map(_.getLong(0)).toSet
    assert(rerunOnBase.subsetOf(base),
      s"${(rerunOnBase -- base).size} docs flipped dropped -> kept")
    // and the shrink is real on this fixture, not vacuous
    assert(rerunOnBase.size < base.size, "superset run did not tighten")
    assert(rerunOnBase.nonEmpty)
  }

  test("full pipeline equals the standalone stages chained by hand") {
    import org.apache.spark.sql.expressions.Window
    val out = TrainPipe.fullPipeline(docs).collect()
    assert(out.nonEmpty)
    // chain the already-proven standalone operators stage by stage
    val kept = docs
      .withColumn("k", min("doc_id").over(
        Window.partitionBy(sha2(col("text"), 256))))
      .filter(col("doc_id") === col("k"))
      .drop("k")
    val repIds = graft.ops.QualityOps.repetitionStats(kept)
      .filter(col("keep") === 1).collect().map(_.getLong(0)).toSet
    val fqIds = graft.ops.QualityOps.freqQuality(kept)
      .filter(col("keep") === 1).collect().map(_.getLong(0)).toSet
    val gated = kept.filter(col("doc_id").isInCollection(repIds intersect fqIds))
    val mixIds = TrainPipe.mixtureSample(gated).collect().map(_.getLong(0)).toSet
    val budIds = TrainPipe.budgetSample(gated.filter(col("doc_id").isInCollection(mixIds)))
      .collect().map(_.getLong(0)).toSet
    val packed = TrainPipe
      .packSequences(docs.filter(col("doc_id").isInCollection(budIds)))
      .collect()
    // same survivors, and identical packing columns for each of them
    assert(out.map(_.getLong(0)).toSeq === packed.map(_.getLong(0)).toSeq)
    val byId = packed.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    out.foreach { r =>
      val (shard, nTok, off, cf, cl) = byId(r.getLong(0))
      assert(r.getLong(4) === shard && r.getLong(3) === nTok &&
        r.getLong(5) === off && r.getLong(6) === cf && r.getLong(7) === cl,
        s"doc ${r.getLong(0)} packing mismatch")
    }
  }

  test("full pipeline plan: text scanned once (deduped corpus materialized), no text in any join key") {
    // fresh (non-shared) frame so cached blocks don't leak into other tests
    val local = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = TrainPipe.fullPipeline(local)
    df.collect()
    val exec = df.queryExecution.executedPlan
    val ls = planLeaves(exec)
    // every branch reads the materialized keeper output, so the executed
    // tree has NO direct parquet scan — the single scan lives inside the
    // cache build (one materialization, plan-guaranteed by Spark's cache)
    val fileScans = ls.count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    val cacheReads = ls.count(_.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec])
    assert(fileScans === 0, s"direct table scans leaked past the materialization:\n$exec")
    assert(cacheReads >= 2, s"gate branches are not reading the materialized corpus:\n$exec")
    // no join ever keys on raw text
    val joinKeys = exec.toString.linesIterator
      .filter(l => l.contains("HashJoin") || l.contains("SortMergeJoin"))
      .mkString("\n")
    assert(!joinKeys.contains("text#"), joinKeys)
    // suites share the session sequentially; drop this test's cache blocks
    spark.catalog.clearCache()
  }

  test("domain cap (q86): no source exceeds the cap, best-first within each") {
    val out = TrainPipe.stratifiedTopK(docs, k = 5, shards = 4, by = "source")
      .collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      assert(rows.length <= 5, s"$src over cap")
      assert(rows.map(_.getLong(3)).sorted.toSeq === (1L to rows.length).toSeq)
      // ranks follow n_chars desc
      val byRank = rows.sortBy(_.getLong(3)).map(_.getLong(2)).toSeq
      assert(byRank === byRank.sorted.reverse, s"$src not best-first")
    }
  }

  test("stratified top-k: two-phase result equals the naive one-phase top-k") {
    import org.apache.spark.sql.expressions.Window
    val out = TrainPipe.stratifiedTopK(docs, k = 7, shards = 4).collect()
    val naive = docs
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("rk") <= 7)
      .orderBy("lang", "rk")
      .collect()
    assert(out.toSeq === naive.toSeq)
    // every language contributes at most k rows, ranks dense from 1
    out.groupBy(_.getString(1)).foreach { case (_, rows) =>
      assert(rows.length <= 7)
      assert(rows.map(_.getLong(3)).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }

  test("stratified top-k plan: every window partitions by (lang, shard) or the survivor frame — never a lone stratum sort of the corpus") {
    val df = TrainPipe.stratifiedTopK(docs)
    val plan = df.queryExecution.executedPlan.toString
    // phase-1 window key includes the shard column
    assert(plan.contains("shard"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("curriculum: stages honor the length bounds, every doc placed once") {
    val out = TrainPipe.curriculum(docs).collect()
    assert(out.length.toLong === docs.count())
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    val chars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val expected = chars(r.getLong(0)) match {
        case n if n < 150 => 0
        case n if n < 300 => 1
        case n if n < 450 => 2
        case _            => 3
      }
      assert(r.getInt(1) === expected, s"doc ${r.getLong(0)}")
    }
  }

  test("curriculum: positions are dense 0..n-1 within every (stage, shard)") {
    val out = TrainPipe.curriculum(docs, shards = 4).collect()
    out.groupBy(r => (r.getInt(1), r.getLong(2))).foreach {
      case ((stage, shard), rows) =>
        val pos = rows.map(_.getLong(3)).sorted.toSeq
        assert(pos === (0L until rows.length).toSeq,
          s"stage=$stage shard=$shard positions not dense")
    }
  }

  test("curriculum is partition-independent and hash-ordered, not ingest-ordered") {
    val a = TrainPipe.curriculum(docs.repartition(1)).collect().toSeq
    val b = TrainPipe.curriculum(docs.repartition(7)).collect().toSeq
    assert(a === b)
    // within at least one shard the position order differs from doc_id
    // order (the ord hash reshuffles the stage stream)
    val reordered = a.groupBy(r => (r.getInt(1), r.getLong(2))).exists {
      case (_, rows) =>
        val byPos = rows.sortBy(_.getLong(3)).map(_.getLong(0)).toSeq
        byPos != byPos.sorted
    }
    assert(reordered, "curriculum order degenerated to ingest order")
  }

  test("curriculum plan: windows are (stage, shard)-partitioned, never global") {
    val plan = TrainPipe.curriculum(docs)
      .queryExecution.executedPlan.toString
    // the position window must not collapse to a single partition
    assert(!plan.contains("SinglePartition"), plan)
  }

  // ------------------------------------------------------------------
  // q92 fuzzy decontamination (example-level gram-set containment)
  // ------------------------------------------------------------------

  test("fuzzy decontam: a verbatim embedded eval doc scores 1.0 however much text surrounds it") {
    import spark.implicits._
    val base = Seq(
      (0L, "alpha beta gamma delta epsilon"),                // held (0 % 10 == 0)
      // held doc embedded verbatim inside 4x unrelated text — the pooled
      // q71 count dilutes toward 0.2, but per-example containment is 1.0
      (1L, "pad1 pad2 pad3 pad4 pad5 pad6 pad7 pad8 " +
        "alpha beta gamma delta epsilon " +
        "pad9 padA padB padC padD padE padF padG"),
      (2L, "zeta eta theta iota kappa"),                     // disjoint -> no row
      (3L, "alpha beta gamma nu xi"))                        // partial: 1 of 3 grams
      .toDF("doc_id", "text")
    val out = TrainPipe.fuzzyDecontaminate(base, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 0L, 1.0), (3L, 0L, 0.3333)))
  }

  test("fuzzy decontam equals the brute-force all-pairs answer") {
    // brute force: full gram-set containment, no bucketing
    val w = 3
    val rows = docs.select("doc_id", "text").collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
      .filter(_._2.length >= w)
      .map { case (id, t) =>
        id -> t.sliding(w).map(_.mkString(" ")).toSet
      }
    val held = rows.filter(_._1 % 10 == 0)
    val corp = rows.filter(_._1 % 10 != 0)
    val expect = (for {
      (hid, hg) <- held
      (did, cg) <- corp
      c = BigDecimal((hg & cg).size.toDouble / hg.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= 0.5
    } yield (did, hid, c)).toSet
    val got = TrainPipe.fuzzyDecontaminate(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expect)
    assert(got.nonEmpty, "fixture produced no contaminated pairs — thresholds degenerate")
  }

  test("fuzzy decontam is partition-independent") {
    val a = TrainPipe.fuzzyDecontaminate(docs.repartition(1)).collect().toSeq
    val b = TrainPipe.fuzzyDecontaminate(docs.repartition(7)).collect().toSeq
    assert(a === b)
  }

  test("fuzzy decontam plan: held postings broadcast; corpus text never build-side") {
    val plan = TrainPipe.fuzzyDecontaminate(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the corpus side must never fall into a nested-loop or cartesian pair
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("fuzzy decontam heldBroadcast=false: prefix-filtered shuffle form is bit-equal") {
    // the real corpus (threshold default)
    val a = TrainPipe.fuzzyDecontaminate(docs).collect().toSeq
    val b = TrainPipe.fuzzyDecontaminate(docs, heldBroadcast = false).collect().toSeq
    assert(a.nonEmpty, "no contaminated pairs — parity is vacuous")
    assert(b === a)
    // a planted boundary case: held doc's grams split between a rare
    // witness and grams ABSENT from the corpus (exercising the df-0
    // prefix padding), still found by the shuffle form
    import spark.implicits._
    val planted = Seq(
      (10L, "unique quiz question answer here today"), // held (10 % 10 == 0)
      (1L, "unique quiz question answer plus trailing corpus body text"),
      (2L, "completely different corpus document body with other words")
    ).toDF("doc_id", "text")
    val pa = TrainPipe.fuzzyDecontaminate(planted).collect().toSeq
    val pb = TrainPipe.fuzzyDecontaminate(planted, heldBroadcast = false).collect().toSeq
    assert(pa.nonEmpty && pb === pa)
    // no required broadcast: the shuffle form never calls broadcast() —
    // its LOGICAL plan carries no ResolvedHint (AQE may still choose a
    // broadcast physically on tiny test data, which is fine and local)
    val logical = TrainPipe.fuzzyDecontaminate(docs, heldBroadcast = false)
      .queryExecution.analyzed.toString
    assert(!logical.contains("UnresolvedHint") && !logical.contains("ResolvedHint"), logical)
  }

  // ------------------------------------------------------------------
  // q93 deterministic epoch shuffle
  // ------------------------------------------------------------------

  test("det shuffle: a permutation — every doc once, positions dense per shard") {
    val out = TrainPipe.deterministicShuffle(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).distinct.length === out.length)
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).sorted.toSeq
      assert(ps === (0L until rows.length).toSeq, s"shard $shard positions not dense")
    }
  }

  test("det shuffle is partition-independent; a different seed is a different permutation") {
    val a = TrainPipe.deterministicShuffle(docs.repartition(1)).collect().toSeq
    val b = TrainPipe.deterministicShuffle(docs.repartition(7)).collect().toSeq
    assert(a === b)
    val ep1 = TrainPipe.deterministicShuffle(docs, seed = "ep1").collect().toSeq
    assert(a.map(_.getLong(0)).toSet === ep1.map(_.getLong(0)).toSet)
    assert(a !== ep1, "epoch seeds produced identical permutations")
  }

  test("det shuffle is append-stable: old docs keep their relative order when the corpus grows") {
    val half = docs.filter(col("doc_id") % 2 === 0)
    val small = TrainPipe.deterministicShuffle(half).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(0)))
    val full = TrainPipe.deterministicShuffle(docs).collect()
      .filter(_.getLong(0) % 2 == 0)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(0)))
    // within each shard the surviving docs appear in the same order —
    // a new doc splices in without reshuffling anyone else
    val bySmall = small.groupBy(_._1).map { case (s, r) => s -> r.sortBy(_._2).map(_._3).toSeq }
    val byFull = full.groupBy(_._1).map { case (s, r) => s -> r.sortBy(_._2).map(_._3).toSeq }
    assert(bySmall.keySet === byFull.keySet)
    bySmall.foreach { case (s, order) => assert(byFull(s) === order, s"shard $s reordered") }
  }

  test("det shuffle plan: the position window is shard-bounded, never global") {
    val plan = TrainPipe.deterministicShuffle(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("q105 weighted sample: weight-proportional, deterministic, zero-weight excluded") {
    import spark.implicits._
    // 200 heavy docs (w=1000) vs 200 light (w=10): E-S inclusion odds
    // scale with weight, so the top-50 must be dominated by heavy docs
    val mix = (0L until 200L).map(i => (i, 1000L)) ++
      (200L until 400L).map(i => (i, 10L)) :+ ((400L, 0L))
    val df = mix.toDF("doc_id", "n_chars")
    val picked = TrainPipe.weightedSample(df, k = 50).collect()
    val heavy = picked.count(_.getLong(0) < 200L)
    assert(heavy > 40, s"only $heavy/50 heavy docs selected — not weight-proportional")
    assert(!picked.exists(_.getLong(0) === 400L), "zero-weight doc drawn")
    // determinism: same selection under different partitioning
    val again = TrainPipe.weightedSample(df.repartition(13), k = 50)
      .collect().map(_.getLong(0)).toSeq
    assert(again === picked.map(_.getLong(0)).toSeq)
    // the draw is a function of doc_id only: appending new docs never
    // flips the relative order of existing keys (stability contract)
    val extended = TrainPipe.weightedSample(
      df.union(Seq((500L, 500L)).toDF("doc_id", "n_chars")), k = 1000).collect()
      .map(_.getLong(0)).filter(_ <= 400L).toSeq
    val base = TrainPipe.weightedSample(df, k = 1000).collect()
      .map(_.getLong(0)).toSeq
    assert(extended === base)
  }

  test("q113 stratified weighted: k per source, same draw as q105 within each stratum") {
    val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val out = TrainPipe.stratifiedWeightedSample(docs, k = 5).collect()
    val bySrc = out.groupBy(_.getString(0))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_.getLong(4)).sorted.toSeq === (1L to rows.length).toSeq)
      // within a stratum the ranking is by the E-S key desc
      val keys = rows.sortBy(_.getLong(4)).map(_.getLong(3)).toSeq
      assert(keys === keys.sorted.reverse)
    }
    // deterministic under partitioning
    val again = TrainPipe.stratifiedWeightedSample(docs.repartition(11), k = 5)
      .collect().map(_.toSeq).toSeq
    assert(again === out.map(_.toSeq).toSeq)
  }

  test("q123 temperature mix: integer budget arithmetic hand-checked; low-resource upsampled") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // big lang: 90 docs x 10 tokens = 900; small: 10 docs x 10 = 100
    val docs = ((0 until 90).map(i => (i.toLong, "big", Seq.fill(10)("w").mkString(" "))) ++
      (0 until 10).map(i => (100L + i, "small", Seq.fill(10)("w").mkString(" "))))
      .toDF("doc_id", "lang", "text")
    val out = TrainPipe.temperatureMixSample(docs, totalBudget = 500L)
    val budgets = out.select("lang", "budget").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // w_q: floor(sqrt(900)*1000)=30000, floor(sqrt(100)*1000)=10000; sum=40000
    // budget_big = 500*30000 div 40000 = 375; budget_small = 500*10000 div 40000 = 125
    assert(budgets === Map("big" -> 375L, "small" -> 125L))
    // temperature keep RATE: small gets 125/100 (>1: keep all) vs big 375/900
    // - the low-resource stratum is upsampled relative to its raw share
    assert(budgets("small").toDouble / 100 > budgets("big").toDouble / 900)
    // keep-all budget (>= total) means every small doc survives
    assert(out.filter(col("lang") === "small").count() === 10)
  }

  test("q123 temperature mix: deterministic under partitioning") {
    val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val a = TrainPipe.temperatureMixSample(docs).collect().map(_.toSeq).toSeq
    val b = TrainPipe.temperatureMixSample(docs.repartition(9)).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("leakage-safe split: no near-dup pair straddles train/eval; every vector gets exactly one side") {
    import graft.ops.{AnnLsh, TrainPipe}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val split = TrainPipe.leakageSafeSplit(emb).collect()
    val side = split.map(r => r.getLong(0) -> r.getString(3)).toMap

    // total, single-sided coverage of the valid corpus
    val validIds = emb
      .filter(org.apache.spark.sql.functions.col("vec_id").isNotNull &&
        org.apache.spark.sql.functions.col("embedding").isNotNull)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(side.keySet === validIds)
    assert(side.values.toSet === Set("train", "eval"),
      "both sides must be non-empty on this corpus")

    // THE guarantee: every near-dup pair lands on one side
    val pairs = AnnLsh.nearDupPairs(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture vacuous: no near-dup pairs to keep together")
    pairs.foreach { case (a, b) =>
      assert(side(a) === side(b), s"near-dup pair ($a,$b) straddles the split")
    }

    // and the split is genuinely cluster-keyed: some cluster with >1
    // member sits entirely in eval (travel-together, not drop-from-eval)
    val clustered = split.filter(_.getLong(2) > 1L)
    assert(clustered.exists(_.getString(3) == "eval") ||
      clustered.groupBy(_.getLong(1)).values.exists(g =>
        g.length > 1 && g.forall(_.getString(3) == "train")),
      "no multi-member cluster observed on either side")
  }
}
