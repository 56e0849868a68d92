package graft

import org.apache.spark.sql.functions._

/** q44 (IVF coarse-quantized ANN) quality + plan-shape checks against the
  * exact q24 baseline.
  */
class AnnIvfSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  test("q44 IVF top-5 recall vs exact q24 is >= 0.4") {
    val exact = pairs("q24_ann_cosine")
    val ivf = pairs("q44_ann_ivf")
    assert(exact.nonEmpty, "exact baseline returned no neighbors")
    // nprobe=4 of nlist=16 untrained (first-vector) centroids; the
    // deterministic quantizer makes observed recall reproducible.
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall: missed ${(exact -- ivf).size} of ${exact.size}")
    info(s"IVF recall = $recall")
  }

  test("k-means-trained centroids: recall vs brute-force exact >= untrained") {
    // q24's 5-query/25-pair sample is too small to resolve quantizer
    // quality (one flipped pair = 4 points of recall); measure over 50
    // queries against an inline brute-force exact top-5.
    val emb = Queries.t(spark, sf, "embeddings").filter(col("embedding").isNotNull)
    val nQueries = 50L
    val exact: Set[(Long, Long)] = {
      val v = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
        d / math.sqrt(na * nb)
      }
      v.filter(_._1 < nQueries).flatMap { case (q, qv) =>
        v.filter(_._1 != q)
          .map { case (n, nv) => (n, cos(qv, nv)) }
          .sortBy { case (n, c) => (-c, n) }
          .take(5).map { case (n, _) => (q, n) }
      }.toSet
    }
    def recallOf(iters: Int): Double = {
      val approx = graft.ops.AnnIvf.annTopK(emb, queryMax = nQueries, trainIters = iters)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    val untrained = recallOf(0)
    val trained = recallOf(5)
    info(s"IVF recall untrained=$untrained trained=$trained over ${exact.size} exact pairs")
    // Lloyd's refines the first-nlist cells toward actual density; on the
    // deterministic test corpus the trained quantizer must do no worse.
    assert(trained >= untrained,
      s"training REDUCED recall: $trained < $untrained")
  }

  test("Lloyd's rounds improve the quantization objective monotonically in practice") {
    // the k-means objective under the cosine assignment: mean best
    // centroid score per vector — training must not make it worse
    val emb = Queries.t(spark, sf, "embeddings").filter(col("embedding").isNotNull)
    def objective(cents: Seq[(Long, Array[Float])]): Double = {
      val sc = graft.ops.AnnIvf.bestScore(col("embedding"), cents)
      emb.agg(avg(sc)).head().getDouble(0)
    }
    val init = objective(graft.ops.AnnIvf.initCentroids(emb))
    val trained = objective(graft.ops.AnnIvf.trainCentroids(emb, iters = 5))
    info(s"quantization objective init=$init trained=$trained")
    assert(trained >= init, s"training worsened the objective: $trained < $init")
  }

  test("trainCentroids: stable ids, refined values, empty-cell fallback") {
    val emb = Queries.t(spark, sf, "embeddings")
    val init = graft.ops.AnnIvf.initCentroids(emb)
    val trained = graft.ops.AnnIvf.trainCentroids(emb, iters = 3)
    assert(trained.map(_._1) == init.map(_._1), "centroid ids not stable")
    assert(trained.map(_._2.length) == init.map(_._2.length))
    // at least one centroid must actually move off its init vector
    assert(init.zip(trained).exists { case ((_, a), (_, b)) => !a.sameElements(b) },
      "no centroid moved after 3 Lloyd's rounds")
  }

  test("trainCentroids is total over dirty embeddings (null elements, ragged dims)") {
    val dirty = spark.sql(
      """SELECT * FROM VALUES
        |  (0L, array(1.0f, 2.0f)),
        |  (1L, array(cast(null AS float), 4.0f)),
        |  (2L, array(5.0f, 6.0f, 7.0f)),
        |  (3L, array(0.5f)),
        |  (4L, cast(null AS array<float>)),
        |  (cast(null AS bigint), array(9.0f, 9.0f))
        |AS t(vec_id, embedding)""".stripMargin)
    val trained = graft.ops.AnnIvf.trainCentroids(dirty, nlist = 2, iters = 3)
    assert(trained.size == 2, "dirty rows changed the centroid count")
    assert(trained.forall(_._2.length == 2), "centroid dims drifted from init")
    assert(trained.forall(_._2.forall(f => !f.isNaN)), "NaN leaked into a centroid")
  }

  test("every corpus vector lands in exactly one list; probes are bounded") {
    val emb = Queries.t(spark, sf, "embeddings")
    val n = emb.count()
    val res = SparkEntry.queries("q44_ann_ivf")(spark, sf)
    // contract columns + no query exceeds k rows
    assert(res.columns.toSeq == Seq("query_id", "neighbor_id", "cosine", "rnk"))
    val overK = res.groupBy("query_id").count().filter(col("count") > 5).count()
    assert(overK == 0)
    assert(n > 0)
  }

  test("q44 physical plan: assignment is map-side (single equi-join on list_id)") {
    val plan = SparkEntry.queries("q44_ann_ivf")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "plan fell back to BNLJ")
    assert(!plan.contains("CartesianProduct"), "plan fell back to cartesian")
  }

  test("knn graph: every edge is mutual, canonically oriented; asymmetric links pruned") {
    import graft.ops.AnnIvf
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val graph = AnnIvf.knnGraph(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(graph.nonEmpty, "fixture vacuous: no mutual edges at this sf")
    assert(graph.forall { case (a, b) => a < b }, "edges must be canonically oriented")
    // reference: the one-sided kNN from the same probe machinery
    val knn = AnnIvf.annTopK(emb, queryMax = Long.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graph.foreach { case (a, b) =>
      assert(knn((a, b)) && knn((b, a)), s"non-mutual edge ($a,$b) survived")
    }
    // pruning is non-vacuous: one-sided links exist and none survive
    val oneSided = knn.filter { case (a, b) => !knn((b, a)) }
    assert(oneSided.nonEmpty, "fixture vacuous: every kNN link is already mutual")
    oneSided.foreach { case (a, b) =>
      val e = if (a < b) (a, b) else (b, a)
      assert(!graph(e), s"asymmetric link $e survived mutuality")
    }
  }

  // ------------------------------------------------ recall eval (q153)

  test("recall@k: bounded to [0,1], and probing EVERY cell recovers recall 1.0") {
    val emb = Queries.t(spark, "/root/testdata/sf0.001", "embeddings")
    val partial = graft.ops.AnnIvf.recallAtK(emb).collect()
    assert(partial.nonEmpty)
    partial.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "hits cannot exceed the exact shortlist")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // nprobe = nlist scans every cell: the IVF candidates are the whole
    // corpus, rankings coincide, recall is exactly 1 for every query
    val full = graft.ops.AnnIvf.recallAtK(emb,
      nprobe = graft.ops.AnnIvf.NList).collect()
    assert(full.nonEmpty)
    full.foreach(r => assert(r.getDouble(3) === 1.0,
      s"query ${r.getLong(0)} recall ${r.getDouble(3)} under full probe"))
  }

  test("q158 nprobe sweep: monotone recall, exact endpoint, and q153 consistency") {
    val emb = Queries.t(spark, sf, "embeddings")
    val nlist = graft.ops.AnnIvf.NList
    val sweep = graft.ops.AnnIvf.recallSweep(emb,
      nprobes = Seq(1, 2, graft.ops.AnnIvf.NProbe, 8, nlist)).collect()
    assert(sweep.nonEmpty)
    // hits non-decreasing in nprobe per query (candidate sets are nested)
    sweep.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val byProbe = rows.sortBy(_.getLong(0)).map(_.getLong(3))
      assert(byProbe.zip(byProbe.tail).forall { case (a, b) => a <= b },
        s"hits not monotone: ${byProbe.toSeq}")
    }
    // nprobe = nlist probes every cell: recall exactly 1.0
    sweep.filter(_.getLong(0) == nlist.toLong)
      .foreach(r => assert(r.getDouble(4) === 1.0))
    // the sweep's rows at the default depth are bit-equal to recallAtK's
    val atDefault = sweep.filter(_.getLong(0) == graft.ops.AnnIvf.NProbe.toLong)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    val q153 = graft.ops.AnnIvf.recallAtK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(atDefault === q153, "sweep diverges from q153 at the same depth")
  }
}
