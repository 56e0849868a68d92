package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Contract for fixed-point PageRank ([[graft.ops.Graph]], q102):
  * hand-checkable structure (hubs outrank leaves; symmetric graphs rank
  * equally), exact determinism under repartitioning (the integer
  * fixed-point discipline's whole point), rank-mass conservation bounds,
  * and the iterate-in-one-lineage shape (no driver-side loop state).
  */
class GraphSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  /** orders/lineitem fragments for an explicit customer→supplier graph:
    * one order row per (cust, supp) edge.
    */
  private def graphFrames(edges: Seq[(Long, Long)]) = {
    val orders = edges.zipWithIndex
      .map { case ((c, _), i) => (i.toLong, c) }
      .toDF("o_orderkey", "o_custkey")
    val lineitem = edges.zipWithIndex
      .map { case ((_, s), i) => (i.toLong, s) }
      .toDF("l_orderkey", "l_suppkey")
    (orders, lineitem)
  }

  private def ranks(edges: Seq[(Long, Long)], parts: Int = 4): Map[String, Long] = {
    val (o, l) = graphFrames(edges)
    Graph.pageRank(o.repartition(parts), l.repartition(parts), topK = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("symmetric bipartite graph: every vertex of a side ranks equally") {
    // 2 customers × 2 suppliers, complete: total symmetry
    val m = ranks(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))
    assert(m.size === 4)
    assert(m("c1") === m("c2"))
    assert(m("s1") === m("s2"))
    assert(m("c1") === m("s1")) // degree-regular: both sides identical
  }

  test("hub supplier outranks leaf suppliers; rank mass stays bounded by the scale") {
    // s1 supplies every customer; s2 supplies only c1
    val m = ranks(Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L)))
    assert(m("s1") > m("s2"))
    assert(m("s1") > m("c2")) // hub beats any leaf customer too
    // truncating integer division only ever LOSES mass: total <= Scale
    assert(m.values.sum <= Graph.Scale)
    assert(m.values.sum > Graph.Scale / 2) // but most mass survives 3 iters
  }

  test("deterministic under partitioning and duplicate order rows") {
    val edges = (1L to 40L).map(c => (c, c % 7 + 1))
    val base = ranks(edges, parts = 1)
    assert(ranks(edges, parts = 13) === base)
    // duplicate (cust, supp) orders collapse in the distinct: same graph
    assert(ranks(edges ++ edges.take(11), parts = 5) === base)
  }

  test("iterations compose in one lineage: iters=1 differs, re-run is bit-equal") {
    val edges = (1L to 20L).map(c => (c, c % 3 + 1))
    val (o, l) = graphFrames(edges)
    val r3a = Graph.pageRank(o, l, iters = 3, topK = 100).collect().toSeq
    val r3b = Graph.pageRank(o, l, iters = 3, topK = 100).collect().toSeq
    val r1 = Graph.pageRank(o, l, iters = 1, topK = 100).collect().toSeq
    assert(r3a === r3b)
    assert(r3a !== r1)
  }

  test("broadcast and shuffle-join twins are bit-equal (the at-scale fallback contract)") {
    val edges = (1L to 60L).map(c => (c, c % 9 + 1))
    val (o, l) = graphFrames(edges)
    val bc = Graph.pageRank(o, l, topK = 100, broadcastRanks = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sh = Graph.pageRank(o, l, topK = 100, broadcastRanks = false)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(bc === sh)
  }

  test("personalized: rank concentrates near the seeds; unreachable vertices are absent") {
    // two disconnected stars: supplier 10 (seed: 10 % 10 = 0) with
    // customers 1..3, supplier 7 (non-seed) with customers 4..6 —
    // teleport mass lands only on the seed component, so the non-seed
    // component receives NOTHING and is filtered from the output
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 7L), (5L, 7L), (6L, 7L))
    val (o, l) = graphFrames(edges)
    val m = Graph.personalizedPageRank(o, l, topK = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.contains("s10") && m("s10") > 0)
    assert(Seq("c1", "c2", "c3").forall(m.contains), m)
    assert(!m.contains("s7") && !m.contains("c4"),
      s"non-seed component received rank: $m")
    // the seed outranks its satellites (it holds the teleport mass)
    assert(m("s10") > m("c1"))
  }

  test("personalized: uniform-seed case equals plain pageRank bit-for-bit") {
    // seedMod = 1 makes EVERY supplier a seed; on a customer-free-of-
    // asymmetry graph the vectors differ from uniform pageRank (teleport
    // is supplier-only), so pin determinism instead: re-run and
    // partition-shift are bit-equal
    val edges = Seq((1L, 10L), (1L, 20L), (2L, 10L), (3L, 30L))
    val (o, l) = graphFrames(edges)
    val a = Graph.personalizedPageRank(o, l, topK = 100)
      .collect().map(_.toSeq).toSeq
    val b = Graph.personalizedPageRank(
        o.repartition(7), l.repartition(3), topK = 100)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("personalized: broadcast and shuffle-join twins are bit-equal") {
    val o = Queries.t(spark, "/root/testdata/sf0.001", "orders")
    val l = Queries.t(spark, "/root/testdata/sf0.001", "lineitem")
    val bc = Graph.personalizedPageRank(o, l, broadcastRanks = true)
      .collect().map(_.toSeq).toSeq
    val sh = Graph.personalizedPageRank(o, l, broadcastRanks = false)
      .collect().map(_.toSeq).toSeq
    assert(bc === sh)
    assert(bc.nonEmpty)
  }

  test("personalized: an empty seed set fails loudly instead of returning an empty frame") {
    // no supplier key ≡ 0 (mod 10) in this graph: Spark's `div ns` with
    // ns = 0 would yield NULL ranks and silently empty the output while
    // the DuckDB oracle raises — the guard makes both engines fail
    val (o, l) = graphFrames(Seq((1L, 1L), (2L, 3L)))
    val e = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(o, l, seedMod = 10)
    }
    assert(e.getMessage.contains("empty seed set"))
  }

  test("weighted: unit weights recover plain pageRank bit-for-bit") {
    // every (cust, supp) pair appears exactly once -> all weights 1,
    // w_total = degree, (r * 1) div deg = the unweighted contribution
    val edges = (1L to 40L).map(c => (c, c % 7 + 1)) ++ Seq((41L, 9L))
    val (o, l) = graphFrames(edges)
    val unweighted = Graph.pageRank(o, l, topK = 100)
      .collect().map(_.toSeq).toSeq
    val weighted = Graph.weightedPageRank(o, l, topK = 100)
      .collect().map(_.toSeq).toSeq
    assert(weighted === unweighted)
    assert(weighted.nonEmpty)
  }

  test("weighted: a heavy edge outranks many light ones; duplicates now matter") {
    // c1..c4 each trade ONCE with s1 and TWELVE times with s2; c5
    // trades once with s1 only. Unweighted (distinct pairs) s1 wins: 5
    // partners vs 4, every shared customer splitting 50/50. Weighted,
    // each shared customer pushes 12/13 of its outflow into s2 every
    // iteration — the trade volume flips the order.
    val light = (1L to 4L).map(c => (c, 1L)) :+ ((5L, 1L))
    val heavy = (1L to 4L).flatMap(c => Seq.fill(12)((c, 2L)))
    val edges = light ++ heavy
    val (o, l) = graphFrames(edges)
    val uw = Graph.pageRank(o, l, topK = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = Graph.weightedPageRank(o, l, topK = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uw("s1") > uw("s2"), "unweighted fixture must favor the partner hub")
    assert(w("s2") > w("s1"),
      s"12x edge weight must outrank 4 unit edges: s1=${w("s1")} s2=${w("s2")}")
    // truncating integer division only ever LOSES mass: total <= Scale
    assert(w.values.sum <= Graph.Scale)
  }

  test("weighted: deterministic under partitioning; broadcast and shuffle twins bit-equal") {
    val o = Queries.t(spark, "/root/testdata/sf0.001", "orders")
    val l = Queries.t(spark, "/root/testdata/sf0.001", "lineitem")
    val bc = Graph.weightedPageRank(o, l, broadcastRanks = true)
      .collect().map(_.toSeq).toSeq
    val sh = Graph.weightedPageRank(
        o.repartition(7), l.repartition(3), broadcastRanks = false)
      .collect().map(_.toSeq).toSeq
    assert(bc === sh)
    assert(bc.nonEmpty)
    // weights genuinely vary on the real data (else this is the unit test)
    assert(bc !== Graph.pageRank(o, l).collect().map(_.toSeq).toSeq)
  }

  test("topK truncates with the rank-desc vertex-asc tiebreak") {
    val m = Graph.pageRank(
      graphFrames(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))._1,
      graphFrames(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))._2,
      topK = 2).collect().map(_.getString(0)).toSeq
    // all four ranks tie -> vertex asc decides: c1, c2
    assert(m === Seq("c1", "c2"))
  }

  // ------------------------------------------------- triangles (q146)

  private def edgeDf(es: (Long, Long)*) = {
    import implicits._
    es.toSeq.toDF("vec_a", "vec_b")
  }

  test("triangles: hand fixture — two triangles sharing a vertex, a tail vertex") {
    // triangle (1,2,3), triangle (3,4,5), tail edge (5,6)
    val out = Graph.triangleStats(edgeDf(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 5L), (5L, 6L)))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toMap
    // vertex 3: degree 4, 2 triangles, 6 wedges, coeff 1/3
    assert(out(3L) === ((4L, 2L, 6L, 2.0 / 6.0)))
    assert(out(1L) === ((2L, 1L, 1L, 1.0)))
    assert(out(5L) === ((3L, 1L, 3L, 1.0 / 3.0)))
    // vertex 6 has degree 1: excluded (no wedge to close)
    assert(!out.contains(6L))
  }

  test("triangles: a triangle-free graph (star + path) yields all-zero counts") {
    val out = Graph.triangleStats(edgeDf(
      (1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 0L, 4L -> 0L))
  }

  test("triangles: oriented enumeration equals the brute-force 3-join on the kNN graph") {
    val emb = Queries.t(spark, "/root/testdata/sf0.001", "embeddings")
    val edges = graft.ops.AnnIvf.knnGraph(emb)
      .select("vec_a", "vec_b").localCheckpoint()
    val out = Graph.triangleStats(edges, topK = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val e = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vs = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val deg = vs.map(v => v -> e.count(p => p._1 == v || p._2 == v)).toMap
    val triPerV = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      Seq(a, b, c) <- vs.combinations(3)
      if e((a, b)) && e((b, c)) && e((a, c))
      v <- Seq(a, b, c)
    } triPerV(v) += 1
    val want = vs.filter(deg(_) >= 2)
      .map(v => (v, deg(v).toLong, triPerV(v))).sorted
    assert(out.toSeq === want)
    assert(want.exists(_._3 > 0L), "the kNN graph must contain triangles")
  }
}
