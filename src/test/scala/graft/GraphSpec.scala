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

  test("topK truncates with the rank-desc vertex-asc tiebreak") {
    val m = Graph.pageRank(
      graphFrames(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))._1,
      graphFrames(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))._2,
      topK = 2).collect().map(_.getString(0)).toSeq
    // all four ranks tie -> vertex asc decides: c1, c2
    assert(m === Seq("c1", "c2"))
  }
}
