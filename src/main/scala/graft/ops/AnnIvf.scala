package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate-nearest-neighbor search — the second
  * scale path for similarity search next to random-hyperplane LSH
  * ([[AnnLsh]]): partition the corpus into `nlist` coarse cells, search
  * only the `nprobe` cells nearest each query.
  *
  * Plan shape, scale-first (classic IVF-Flat, cf. the FAISS paper,
  * Johnson/Douze/Jégou '17):
  *
  *   1. quantizer: `nlist` centroids. They are TINY (nlist × dim), so they
  *      are collected once and inlined as literal arrays — assignment is a
  *      pure map over the corpus (argmax of `nlist` codegen'd dot
  *      products), NO shuffle, no join. At 100 TB the corpus never moves;
  *      only its (vec_id, list_id) assignment does.
  *   2. probe: each query scores the same centroid literals and keeps its
  *      `nprobe` best lists — map-side again.
  *   3. search: probes equi-join the assignment on `list_id`, so the
  *      exact-cosine work is bounded by the probed fraction
  *      (~nprobe/nlist of the corpus), never all-pairs.
  *
  * Centroid choice is pluggable: here the quantizer is the deterministic
  * "first `nlist` vectors" (vec_id < nlist) so the DuckDB oracle can
  * regenerate it exactly; a production build would k-means-train the
  * centroids — every stage downstream of the centroid table is unchanged.
  *
  * Determinism: centroid scores are rounded to 6 decimals BEFORE the
  * argmax/top-nprobe selection in both engines, so a last-ulp difference
  * in floating-point accumulation order can't flip an assignment; ties
  * break toward the smaller centroid id.
  */
object AnnIvf {

  val NList = 16
  val NProbe = 4

  // native codegen'd loop, bit-identical to the aggregate/zip_with fold
  // it replaces (see graft.functions.VecDot)
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  /** Per-vector array of (score, -centroid_id) structs against the literal
    * centroids; struct ordering = score asc then centroid id desc, so
    * `array_max` / descending sort pick max score with min id on ties.
    * One fused native pass ([[graft.functions.IvfScores]]) — the
    * compositional nlist-dot struct array hit the same JIT method-size
    * interpretation cliff as the LSH bucketing (BENCH_NOTES r11);
    * bit-identical scores, AnnIvfSpec + the q44 oracle pin it.
    */
  private[ops] def scored(vecCol: Column, cents: Seq[(Long, Array[Float])]): Column = {
    val centroids = cents.map { case (cid, v) => cid -> v.toIndexedSeq.map(_.toDouble) }
    val norms = cents.map { case (_, v) =>
      math.sqrt(v.foldLeft(0.0)((acc, f) => acc + f.toDouble * f.toDouble))
    }
    graft.functions.VectorFunctions.ivfScores(vecCol, centroids, norms)
  }

  /** Best (max) centroid score for a vector column — the per-vector term
    * of the spherical-k-means objective; exposed for the training spec.
    */
  private[graft] def bestScore(vecCol: Column, cents: Seq[(Long, Array[Float])]): Column =
    array_max(scored(vecCol, cents)).getField("s")

  /** Deterministic "first `nlist` vectors" quantizer — the oracle-
    * reproducible init (and q44's production quantizer). nlist × dim
    * floats: a bounded driver collect by construction.
    */
  def initCentroids(emb: DataFrame, nlist: Int = NList): Seq[(Long, Array[Float])] =
    emb
      // null vectors can't serve as centroids (dirty-data totality)
      .filter(col("vec_id") < nlist && col("vec_id").isNotNull &&
        col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toIndexedSeq
      .sortBy(_._1)

  /** Lloyd's k-means over DataFrames — the trained quantizer. Same loop
    * discipline as [[Clusters.connectedComponents]]: a bounded number of
    * rounds, each ONE distributed pass.
    *
    * Scale shape per round: assignment is a pure map against the literal
    * centroids (argmax of nlist codegen'd dots — the corpus never
    * shuffles); the update poses as posexplode + hash aggregate on
    * (list_id, pos), whose map-side partials collapse each task's
    * contribution to ≤ nlist × dim rows before the shuffle — the same
    * partial-sum shape MLlib's KMeans uses. Only the nlist × dim stats
    * rows reach the driver.
    *
    * Determinism: assignments reuse [[scored]]'s 6-decimal rounding +
    * min-id tie-break; a cell left empty keeps its previous centroid, and
    * centroid ids are stable across rounds (cell i refines init vector i).
    */
  def trainCentroids(emb: DataFrame, nlist: Int = NList, iters: Int = 5): Seq[(Long, Array[Float])] = {
    var cents = initCentroids(emb, nlist)
    if (cents.isEmpty) return cents
    val valid = emb.filter(col("vec_id").isNotNull && col("embedding").isNotNull)
    for (_ <- 0 until iters) {
      val sc = scored(col("embedding"), cents)
      // assignment and explode in separate projects: a generator in the
      // same select would make the analyzer re-plan the struct-typed
      // argmax expression and lose its field names
      // count(col) not count(*): null ELEMENTS inside an otherwise
      // non-null vector must not bias the mean toward 0
      val stats = valid
        .select((-array_max(sc).getField("nc")).as("list_id"), col("embedding"))
        .select(col("list_id"), posexplode(col("embedding")))
        .groupBy(col("list_id"), col("pos"))
        .agg(sum(col("col").cast("double")).as("s"), count(col("col")).as("n"))
        .collect()
      val byList = stats.groupBy(_.getLong(0))
      cents = cents.map { case (cid, old) =>
        byList.get(cid).fold(cid -> old) { rows =>
          // start from the previous centroid: positions with no non-null
          // data (all-null column, or ragged vectors shorter than dim)
          // keep their old component instead of crashing or zeroing;
          // positions beyond the centroid dim (over-long vectors) are
          // dropped — totality over dirty embeddings
          val mean = old.clone()
          rows.foreach { r =>
            val pos = r.getInt(1)
            if (!r.isNullAt(2) && r.getLong(3) > 0 && pos < mean.length)
              mean(pos) = (r.getDouble(2) / r.getLong(3)).toFloat
          }
          cid -> mean
        }
      }
    }
    cents
  }

  /** Top-k approximate neighbors for queries vec_id < `queryMax`:
    * (query_id, neighbor_id, cosine, rnk) — same output contract as
    * [[AnnLsh.annTopK]] and exact q24.
    *
    * `trainIters = 0` (default, the oracle anchor) searches against the
    * deterministic first-nlist quantizer; `> 0` first refines those
    * centroids with that many Lloyd's rounds ([[trainCentroids]]) —
    * every stage downstream of the centroid literals is identical.
    */
  def annTopK(emb: DataFrame, queryMax: Long = 5L, k: Int = 5,
      nlist: Int = NList, nprobe: Int = NProbe, trainIters: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    val cents: Seq[(Long, Array[Float])] =
      if (trainIters > 0) trainCentroids(emb, nlist, trainIters)
      else initCentroids(emb, nlist)

    // empty corpus → empty quantizer: array() has no element type, so the
    // argmax expression would not analyze; return the empty contract frame
    if (cents.isEmpty)
      return emb.select(
        col("vec_id").as("query_id"), col("vec_id").as("neighbor_id"),
        lit(0.0).as("cosine"), lit(0L).as("rnk")).limit(0)

    val sc = scored(col("embedding"), cents)
    // Null vectors are excluded on BOTH sides (mirroring the centroid
    // filter): without this they'd score null against every centroid, win
    // the min-centroid tie-break, and surface as null-cosine neighbors the
    // oracle (whose unnest of NULL yields no rows) never produces.
    // Spread.widen: the probe join and its exact-cosine scoring pipeline
    // onto this frame's layout, and a small corpus is ONE scan split —
    // the r18 profile measured q138's whole probe/score/rank pass as a
    // single 2.1 s task on a 32-core box. Conditional twice over: the
    // helper is a no-op on an already-wide scan, and the respread only
    // applies when the QUERY side is corpus-scale (the q138 knnGraph
    // mode, where candidates ~ n·nprobe·cell) — for a queryMax-bounded
    // probe the candidate work is query-bounded and the exchange
    // measured net-negative (q44 1.35×, q153 1.23× in the r18 close
    // bench). Both join sides derive from the same respread frame, so
    // the physical plan reuses one exchange.
    val filtered = emb.filter(col("embedding").isNotNull)
    val valid =
      if (queryMax == Long.MaxValue) Spread.widen(filtered, col("vec_id"))
      else filtered
    // norms ride with each side (once per vector, not per candidate
    // pair — bit-identical sqrt(dot(v,v)) either way; the AnnLsh
    // fused-norm discipline)
    val assigned = valid.select(
      col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nn"),
      (-array_max(sc).getField("nc")).as("list_id"))
    val probes = valid
      .filter(col("vec_id") < queryMax)
      .select(
        col("vec_id").as("query_id"), col("embedding").as("qv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn"),
        explode(transform(
          slice(reverse(array_sort(sc)), 1, nprobe),
          x => -x.getField("nc"))).as("list_id"))

    val cand = probes
      .join(assigned, "list_id")
      .filter(col("query_id") =!= col("vec_id"))
    val sims = cand.select(
      col("query_id"),
      col("vec_id").as("neighbor_id"),
      round(
        dot(col("qv"), col("embedding")) / (col("qn") * col("nn")),
        4).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cosine"), asc("neighbor_id"))
    sims
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }

  /** Mutual-kNN graph over the whole corpus (q138): EVERY vector probes
    * its `nprobe` cells for its `k` nearest neighbors (the [[annTopK]]
    * machinery with the query side = the corpus), then an edge (a, b)
    * survives iff a is in kNN(b) AND b is in kNN(a) — the mutual-kNN
    * graph, the standard noise-robust backbone for graph clustering and
    * near-dup mining over embeddings (one-sided kNN links a cluster
    * point to an outlier; mutuality prunes exactly those asymmetric
    * edges).
    *
    * Scale shape: the kNN pass is the IVF probe join (candidates
    * bounded by the probed fraction, never all-pairs); the mutuality
    * check is ONE self equi-join of the n·k-row kNN frame on the
    * reversed pair key — corpus-scale but thin (two longs + a double
    * per row), shuffled on the pair key, no broadcast needed at any n.
    * The kNN frame is checkpointed so both join sides read one
    * materialization. Output (vec_a, vec_b, cosine), vec_a < vec_b.
    */
  def knnGraph(emb: DataFrame, k: Int = 5,
      nlist: Int = NList, nprobe: Int = NProbe, trainIters: Int = 0): DataFrame = {
    val knn0 = annTopK(emb, queryMax = Long.MaxValue, k, nlist, nprobe, trainIters)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    // both sides of the mutuality self-join read this materialization;
    // RELIABLE checkpoint when a dir is set (a local checkpoint's blocks
    // die with their executor, aborting the multi-pass job at cluster
    // scale — the Clusters r5 contract), local otherwise
    val knn = Checkpoints.materialize(knn0)
    knn.as("f")
      .join(knn.as("r"),
        col("f.query_id") === col("r.neighbor_id") &&
          col("f.neighbor_id") === col("r.query_id"))
      .filter(col("f.query_id") < col("f.neighbor_id"))
      .select(col("f.query_id").as("vec_a"),
        col("f.neighbor_id").as("vec_b"),
        col("f.cosine").as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** DuckDB oracle for [[knnGraph]]: [[oracleSql]]'s CTE chain with the
    * query filter lifted (every vector probes), wrapped in the mutual
    * self-join. The cosine emitted is the forward edge's — bit-equal to
    * the reverse's (same products, 4dp rounding) and replayed
    * identically here.
    */
  def knnGraphOracleSql(k: Int = 5,
      nlist: Int = NList, nprobe: Int = NProbe): String =
    s"""WITH ex AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
       |    generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |cents AS (SELECT vec_id AS cid, x, i FROM ex WHERE vec_id < $nlist),
       |cnorm AS (SELECT cid, sqrt(sum(x * x)) AS nrm FROM cents GROUP BY 1),
       |scores AS (
       |  SELECT e.vec_id, c.cid, round(sum(e.x * c.x) / cn.nrm, 6) AS s
       |  FROM ex e JOIN cents c ON c.i = e.i JOIN cnorm cn ON cn.cid = c.cid
       |  GROUP BY e.vec_id, c.cid, cn.nrm),
       |ranked AS (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
       |  FROM scores),
       |assigned AS (SELECT vec_id, cid AS list_id FROM ranked WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, cid AS list_id
       |  FROM ranked WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN assigned a ON a.list_id = p.list_id
       |  WHERE a.vec_id <> p.query_id),
       |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY 1),
       |sims AS (
       |  SELECT cd.query_id, cd.neighbor_id,
       |    round(sum(a.x * b.x) / (na.nrm * nb.nrm), 4) AS cosine
       |  FROM cand cd
       |  JOIN ex a ON a.vec_id = cd.query_id
       |  JOIN ex b ON b.vec_id = cd.neighbor_id AND b.i = a.i
       |  JOIN norms na ON na.vec_id = cd.query_id
       |  JOIN norms nb ON nb.vec_id = cd.neighbor_id
       |  GROUP BY 1, 2, na.nrm, nb.nrm),
       |knn AS (
       |  SELECT query_id, neighbor_id, cosine FROM (
       |    SELECT query_id, neighbor_id, cosine,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, neighbor_id) AS rnk
       |    FROM sims) WHERE rnk <= $k)
       |SELECT f.query_id AS vec_a, f.neighbor_id AS vec_b, f.cosine AS cosine
       |FROM knn f JOIN knn r
       |  ON r.query_id = f.neighbor_id AND r.neighbor_id = f.query_id
       |WHERE f.query_id < f.neighbor_id
       |ORDER BY vec_a, vec_b""".stripMargin

  /** DuckDB SQL replicating [[annTopK]]: same first-nlist quantizer, same
    * 6-decimal score rounding, same min-id tie-break, same probe width.
    */
  def oracleSql(queryMax: Long = 5L, k: Int = 5,
      nlist: Int = NList, nprobe: Int = NProbe): String =
    s"""WITH ex AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
       |    generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |cents AS (SELECT vec_id AS cid, x, i FROM ex WHERE vec_id < $nlist),
       |cnorm AS (SELECT cid, sqrt(sum(x * x)) AS nrm FROM cents GROUP BY 1),
       |scores AS (
       |  SELECT e.vec_id, c.cid, round(sum(e.x * c.x) / cn.nrm, 6) AS s
       |  FROM ex e JOIN cents c ON c.i = e.i JOIN cnorm cn ON cn.cid = c.cid
       |  GROUP BY e.vec_id, c.cid, cn.nrm),
       |ranked AS (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
       |  FROM scores),
       |assigned AS (SELECT vec_id, cid AS list_id FROM ranked WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, cid AS list_id
       |  FROM ranked WHERE vec_id < $queryMax AND rn <= $nprobe),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN assigned a ON a.list_id = p.list_id
       |  WHERE a.vec_id <> p.query_id),
       |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY 1),
       |sims AS (
       |  SELECT cd.query_id, cd.neighbor_id,
       |    round(sum(a.x * b.x) / (na.nrm * nb.nrm), 4) AS cosine
       |  FROM cand cd
       |  JOIN ex a ON a.vec_id = cd.query_id
       |  JOIN ex b ON b.vec_id = cd.neighbor_id AND b.i = a.i
       |  JOIN norms na ON na.vec_id = cd.query_id
       |  JOIN norms nb ON nb.vec_id = cd.neighbor_id
       |  GROUP BY 1, 2, na.nrm, nb.nrm)
       |SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM sims) WHERE rnk <= $k
       |ORDER BY query_id, rnk""".stripMargin

  // -------------------------------------------------------------------
  // ANN recall evaluation (q153): recall@k of the IVF index against the
  // exact brute-force ranking — THE metric every approximate-index
  // deployment reports (FAISS's published evaluation protocol), here as
  // a first-class operator so index-parameter sweeps (nlist/nprobe) are
  // one query away instead of a hand-built harness. Both rankings use
  // the SAME rounded-cosine + neighbor-id tie-break, so recall is
  // well-defined and deterministic (AnnLshSpec asserts a recall FLOOR
  // as a test; this op reports the exact per-query value as data).
  //
  // Shape, scale-first: the exact side broadcasts the ≤ queryMax query
  // slivers against the corpus (the q24 shape — bounded by contract:
  // recall evaluation samples queries, it never runs all-pairs); the
  // approx side is the IVF probe join. The comparison is one left-semi
  // join of two k·|queries|-row shortlists.
  // -------------------------------------------------------------------

  /** Per-query recall@k of [[annTopK]] (IVF, `nlist`/`nprobe`) against
    * the exact ranking: (query_id, n_exact, hits, recall). n_exact =
    * |exact shortlist| (= k unless the corpus is smaller); recall =
    * hits / n_exact, two exact longs into one double division.
    */
  def recallAtK(
      emb: DataFrame,
      queryMax: Long = 5L,
      k: Int = 5,
      nlist: Int = NList,
      nprobe: Int = NProbe): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val valid = emb.filter(col("embedding").isNotNull)
    val q = valid.filter(col("vec_id") < queryMax)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn"))
    val c = valid.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("nv"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), asc("neighbor_id"))
    val exact = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4)
          .as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id")
    val approx = annTopK(emb, queryMax, k, nlist, nprobe)
      .select("query_id", "neighbor_id")
    // both shortlists are k·|queries| rows by the sampling contract —
    // broadcast them so the comparison never sort-merges
    val hits = exact
      .join(broadcast(approx), Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
      .join(broadcast(hits), Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall", col("hits") / col("n_exact"))
      .orderBy("query_id")
  }

  /** nprobe sweep of [[recallAtK]] (q158): the recall curve an index-
    * tuning loop actually reads — recall@k at EVERY probe depth in
    * `nprobes`, from ONE corpus scan. The probe join runs once at
    * max(nprobes) with each candidate tagged by the CENTROID RANK
    * (`crn`) of the list that admitted it (each vector lives in exactly
    * one list, so crn is unique per (query, neighbor)); the per-depth
    * shortlist is then a FILTER (crn ≤ p) + re-rank over the
    * checkpointed candidate frame — no second pass over the corpus for
    * any depth. The exact shortlist is computed once and reused by
    * every depth's semi-join.
    *
    * Monotonicity is structural: the candidate set at p is a superset
    * of the set at p' < p, so hits (and recall) are non-decreasing in
    * nprobe; at nprobe = nlist every list is probed, the candidate set
    * IS the corpus, and recall is exactly 1.0 (same rounded cosine +
    * id tie-break on both rankings) — both spec-asserted.
    *
    * Output: (nprobe, query_id, n_exact, hits, recall), nprobe asc /
    * query_id asc; the rows at nprobe = [[NProbe]] are bit-equal to
    * [[recallAtK]]'s.
    */
  def recallSweep(
      emb: DataFrame,
      queryMax: Long = 5L,
      k: Int = 5,
      nlist: Int = NList,
      nprobes: Seq[Int] = Seq(1, 2, NProbe, 8, NList)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nprobes.nonEmpty && nprobes.forall(p => p >= 1 && p <= nlist),
      s"nprobes must be within [1, nlist=$nlist], got $nprobes")
    val cents = initCentroids(emb, nlist)
    // empty corpus -> empty quantizer: return the empty contract frame
    // (the annTopK totality discipline — EmptyInputSpec)
    if (cents.isEmpty)
      return emb.select(
        lit(0L).as("nprobe"), col("vec_id").as("query_id"),
        lit(0L).as("n_exact"), lit(0L).as("hits"),
        lit(0.0).as("recall")).limit(0)
    val maxProbe = nprobes.max
    val sc = scored(col("embedding"), cents)
    val valid = emb.filter(col("embedding").isNotNull)
    val assigned = valid.select(
      col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nn"),
      (-array_max(sc).getField("nc")).as("list_id"))
    val probes = valid
      .filter(col("vec_id") < queryMax)
      .select(
        col("vec_id").as("query_id"), col("embedding").as("qv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn"),
        posexplode(transform(
          slice(reverse(array_sort(sc)), 1, maxProbe),
          x => -x.getField("nc"))))
      .select(col("query_id"), col("qv"), col("qn"),
        (col("pos") + 1).as("crn"), col("col").as("list_id"))
    val sims0 = probes
      .join(assigned, "list_id")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("crn"),
        round(dot(col("qv"), col("embedding")) / (col("qn") * col("nn")), 4)
          .as("cosine"))
    // every sweep depth re-reads the candidate frame — materialize ONCE
    // (candidates are bounded by the |queries| × probed-fraction
    // contract); RELIABLE checkpoint when a dir is set (the Clusters r5
    // contract), local otherwise
    val sims = Checkpoints.materialize(sims0)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), asc("neighbor_id"))
    val q = valid.filter(col("vec_id") < queryMax)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn"))
    val c = valid.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("nv"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nn"))
    val exact0 = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4)
          .as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id")
    val exact = Checkpoints.materialize(exact0)
    val nExact = exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
    nprobes.sorted.map { p =>
      val approx = sims.filter(col("crn") <= p)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select("query_id", "neighbor_id")
      val hits = exact
        .join(broadcast(approx), Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      nExact
        .join(broadcast(hits), Seq("query_id"), "left")
        .select(lit(p.toLong).as("nprobe"), col("query_id"), col("n_exact"),
          coalesce(col("hits"), lit(0L)).as("hits"))
        .withColumn("recall", col("hits") / col("n_exact"))
    }.reduce(_.unionByName(_))
      .orderBy("nprobe", "query_id")
  }

  /** DuckDB oracle for [[recallSweep]]: one [[recallOracleSql]] replay
    * per depth, unioned with the depth as a column. */
  def recallSweepOracleSql(
      queryMax: Long = 5L,
      k: Int = 5,
      nlist: Int = NList,
      nprobes: Seq[Int] = Seq(1, 2, NProbe, 8, NList)): String =
    nprobes.sorted
      .map(p =>
        s"""SELECT CAST($p AS BIGINT) AS nprobe, * FROM (
           |${recallOracleSql(queryMax, k, nlist, p)}
           |)""".stripMargin)
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY nprobe, query_id")

  /** DuckDB oracle for [[recallAtK]]: the q24 exact CTE and the IVF
    * oracle as subqueries, the same semi-join fold.
    */
  def recallOracleSql(
      queryMax: Long = 5L,
      k: Int = 5,
      nlist: Int = NList,
      nprobe: Int = NProbe): String =
    s"""WITH ex AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
       |    generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY 1),
       |sims AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    round(sum(a.x * b.x) / (na.nrm * nb.nrm), 4) AS cosine
       |  FROM ex a
       |  JOIN ex b ON a.i = b.i AND a.vec_id < $queryMax AND a.vec_id <> b.vec_id
       |  JOIN norms na ON na.vec_id = a.vec_id
       |  JOIN norms nb ON nb.vec_id = b.vec_id
       |  GROUP BY 1, 2, na.nrm, nb.nrm),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, neighbor_id) AS rnk
       |    FROM sims) WHERE rnk <= $k),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |${oracleSql(queryMax, k, nlist, nprobe)}
       |  )),
       |hits AS (
       |  SELECT e.query_id, CAST(count(*) AS BIGINT) AS hits
       |  FROM exact e
       |  WHERE EXISTS (SELECT 1 FROM approx a
       |    WHERE a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id)
       |  GROUP BY 1),
       |nex AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
       |  FROM exact GROUP BY 1)
       |SELECT nex.query_id, nex.n_exact,
       |  coalesce(hits.hits, 0) AS hits,
       |  coalesce(hits.hits, 0) / nex.n_exact AS recall
       |FROM nex LEFT JOIN hits ON hits.query_id = nex.query_id
       |ORDER BY nex.query_id""".stripMargin
}
