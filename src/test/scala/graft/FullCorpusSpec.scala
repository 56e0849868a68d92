package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{AnnLsh, NearDup, TextOps}

/** The unsliced (full-corpus) similarity paths: every document/vector on
  * BOTH sides of the candidate join — dedup's real shape at 100 TB.
  *
  * Two families of assertions per operator:
  *   - plan shape: the candidate self-join is a shuffle SortMergeJoin on
  *     the band/bucket keys, with NO broadcast of either corpus side and
  *     no BNLJ/cartesian fallback (a broadcast of the exploded band frame
  *     is a driver OOM when the query set IS the corpus);
  *   - correctness: restricting the full-corpus output to the slice ids
  *     reproduces exactly the sliced output, which the driver's DuckDB
  *     oracle hash-checks every round — so the unsliced path inherits the
  *     oracle's verdict.
  */
class FullCorpusSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docs = Queries.t(spark, sf, "documents")
  private def emb = Queries.t(spark, sf, "embeddings")

  /** The executed plan, AQE final iteration included (collect() executes
    * the frame's own QueryExecution, so runtime re-planning is visible).
    */
  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def assertShufflePairJoin(df: DataFrame, label: String): Unit = {
    val plan = planOf(df)
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"$label: BNLJ in plan")
    assert(!plan.contains("CartesianProduct"), s"$label: cartesian in plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"$label: candidate join is not a shuffle join:\n$plan")
  }

  /** No BroadcastExchange anywhere in a candidates-only plan: the frames
    * under test end at the candidate pair set, before the verification
    * joins (where broadcasting the tiny token/vector side is desirable).
    */
  private def assertNoBroadcast(df: DataFrame, label: String): Unit = {
    val plan = planOf(df)
    assert(!plan.contains("BroadcastExchange"),
      s"$label: corpus-side candidate join used a broadcast:\n$plan")
  }

  private def pairSet(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(col(a), col(b)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // ---------------------------------------------------------------- MinHash

  test("unsliced lshNearDupPairs: shuffle join plan, no broadcast, no BNLJ") {
    val full = NearDup.lshNearDupPairs(docs, sliceMax = None)
    assertShufflePairJoin(full, "minhash-full")
    // candidates-only frame: NOTHING may be broadcast — when the query set
    // is the corpus, a broadcast of the exploded band frame is driver OOM
    val bk = NearDup.bands(NearDup.signatures(NearDup.tokens(docs)))
    assertNoBroadcast(NearDup.candidatesFromBands(bk, None, None), "minhash-candidates")
    assertNoBroadcast(
      NearDup.candidatesFromBands(bk, None, Some(64L)), "minhash-candidates-capped")
    assertNoBroadcast(
      AnnLsh.candidatesFromBuckets(
        AnnLsh.buckets(emb, 64), "vec_a", strict = true, None, None),
      "ann-candidates")
  }

  test("unsliced lshNearDupPairs restricted to the slice == sliced output") {
    val full = NearDup.lshNearDupPairs(docs, sliceMax = None)
      .filter(col("doc_a") < 100)
    val sliced = NearDup.lshNearDupPairs(docs, sliceMax = Some(100L))
    assert(pairSet(full, "doc_a", "doc_b") == pairSet(sliced, "doc_a", "doc_b"))
    assert(sliced.count() > 0, "sliced baseline empty — test data changed?")
  }

  test("hot-band guard bounds candidate generation and stays a shuffle join") {
    val capped = NearDup.lshNearDupPairs(docs, sliceMax = None, hotBandMax = Some(64L))
    val full = NearDup.lshNearDupPairs(docs, sliceMax = None)
    assertShufflePairJoin(capped, "minhash-capped")
    val cappedSet = pairSet(capped, "doc_a", "doc_b")
    val fullSet = pairSet(full, "doc_a", "doc_b")
    assert(cappedSet.subsetOf(fullSet), "guard invented pairs")
    assert(cappedSet.size < fullSet.size,
      "guard dropped nothing on a corpus with known hot bands")
  }

  // ---------------------------------------------------------------- SimHash

  test("unsliced simhashPairs: shuffle join plan + slice-restriction equality") {
    val full = TextOps.simhashPairs(docs, sliceMax = None)
    assertShufflePairJoin(full, "simhash-full")
    val restricted = pairSet(full.filter(col("doc_a") < 100), "doc_a", "doc_b")
    val sliced = pairSet(TextOps.simhashPairs(docs, sliceMax = Some(100L)), "doc_a", "doc_b")
    assert(restricted == sliced)
  }

  // ------------------------------------------------------------- Embeddings

  test("unsliced AnnLsh.nearDupPairs: shuffle join plan + slice-restriction equality") {
    val full = AnnLsh.nearDupPairs(emb, sliceMax = None)
    assertShufflePairJoin(full, "embed-neardup-full")
    val restricted = pairSet(full.filter(col("vec_a") < 100), "vec_a", "vec_b")
    val sliced = pairSet(AnnLsh.nearDupPairs(emb, sliceMax = Some(100L)), "vec_a", "vec_b")
    assert(restricted == sliced)
  }

  test("unsliced AnnLsh.annTopK (full k-NN graph): every vector is a query") {
    val full = AnnLsh.annTopK(emb, queryMax = None)
    assertShufflePairJoin(full, "knn-graph")
    val fullRows = full.collect()
    val queries = fullRows.map(_.getLong(0)).toSet
    assert(queries.size > 100, s"expected a query row for most vectors, got ${queries.size}")
    // restriction equality against the sliced (oracle-checked) shape
    val restricted = fullRows.filter(_.getLong(0) < 5)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val sliced = AnnLsh.annTopK(emb, queryMax = Some(5L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(restricted == sliced)
  }

  // -------------------------------------------------- Linear dedup clusters

  test("q68 lshDedupClusters agrees with pair-enumeration + transitive closure") {
    val clusters = NearDup.lshDedupClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: connected components over the UNSLICED verified... no —
    // over the raw candidate connectivity. Bucket-min edges connect exactly
    // the docs sharing a band bucket, so components must match CC over the
    // full pair list derived from shared buckets (threshold plays no role).
    val bk = NearDup.bands(NearDup.signatures(NearDup.tokens(docs)))
    val pairs = bk.as("x").join(bk.as("y"),
        col("x.band") === col("y.band") && col("x.k1") === col("y.k1") &&
          col("x.k2") === col("y.k2") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    val cc = graft.ops.Clusters.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc.foreach { case (v, lbl) =>
      assert(clusters(v) == lbl, s"doc $v: cluster ${clusters(v)} != pair-CC $lbl")
    }
    // docs absent from every shared bucket are singletons keeping their id
    clusters.filterNot { case (v, _) => cc.contains(v) }.foreach { case (v, lbl) =>
      assert(v == lbl, s"singleton $v got foreign cluster $lbl")
    }
    // exactly one keeper per cluster: the minimum
    val byCluster = clusters.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid: min member ${members.keys.min}")
    }
  }
}
