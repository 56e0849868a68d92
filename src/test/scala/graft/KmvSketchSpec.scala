package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvSketch

/** Contract for the KMV distinct-count sketch
  * ([[graft.functions.KmvMinHashesAgg]], q100): the sketch is the exact
  * k smallest distinct hashes regardless of partitioning or row order
  * (the mergeable-summary determinism the oracle compare relies on),
  * under-k groups report the exact distinct count, nulls count nothing,
  * and the estimator lands inside the theoretical error band.
  */
class KmvSketchSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private def sketch(xs: Seq[Long], k: Int, parts: Int): Seq[Long] =
    xs.toDF("x")
      .repartition(parts)
      .agg(KmvSketch.kmvMinHashes(KmvSketch.hash(col("x")), k).as("mh"))
      .head().getSeq[Long](0)

  test("sketch = exact k smallest distinct hashes, any partitioning or order") {
    val xs = (0L until 5000L) ++ (0L until 5000L) // every value twice
    val k = 64
    val expected = xs.distinct
      .map(x => ((x * KmvSketch.A1 + KmvSketch.B1) % KmvSketch.P * KmvSketch.A2 +
        KmvSketch.B2) % KmvSketch.P)
      .distinct.sorted.take(k)
    for (parts <- Seq(1, 7, 32)) {
      assert(sketch(new scala.util.Random(parts).shuffle(xs), k, parts) === expected)
    }
  }

  test("fewer than k distinct values: the sketch IS the distinct hash set, estimate exact") {
    val xs = Seq.fill(50)(Seq(3L, 14L, 159L, 2653L)).flatten
    val k = 64
    val mh = sketch(xs, k, parts = 5)
    assert(mh.length === 4)
    assert(mh === mh.sorted)
    val est = xs.toDF("x")
      .agg(KmvSketch.kmvMinHashes(KmvSketch.hash(col("x")), k).as("mh"))
      .select(KmvSketch.kmvEstimate("mh", k).as("est"))
      .head().getLong(0)
    assert(est === 4L)
  }

  test("nulls count nothing, like count(col)") {
    val df = Seq[Option[Long]](Some(1L), None, Some(2L), None, Some(1L)).toDF("x")
    val mh = df
      .agg(KmvSketch.kmvMinHashes(KmvSketch.hash(col("x")), 8).as("mh"))
      .head().getSeq[Long](0)
    assert(mh.length === 2)
  }

  test("estimator accuracy: within 3 standard errors of exact on 40k distinct keys") {
    val n = 40000
    val k = 1024
    val est = (0L until n.toLong).toDF("x")
      .repartition(16)
      .agg(KmvSketch.kmvMinHashes(KmvSketch.hash(col("x")), k).as("mh"))
      .select(KmvSketch.kmvEstimate("mh", k).as("est"))
      .head().getLong(0)
    val tol = 3.0 / math.sqrt(k - 2.0) // Beyer et al. relative std error
    assert(math.abs(est - n).toDouble / n < tol,
      s"estimate $est vs exact $n outside ${tol * 100}%")
  }

  test("merge truncation: a sketch over a widely-spread corpus never exceeds k") {
    val xs = (0L until 10000L).map(x => x * 977L % 999983L)
    val mh = sketch(xs, k = 32, parts = 13)
    assert(mh.length === 32)
    assert(mh === mh.sorted)
  }

  test("q122 audience overlap: estimates exact under k, inclusion-exclusion holds") {
    val out = SparkEntry.queries("q122_audience_overlap")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === 10) // C(5,2) event-type pairs
    import org.apache.spark.sql.functions._
    val ev = Queries.t(spark, "/root/testdata/sf0.001", "events")
      .filter(col("user_id").isNotNull)
    val exactByType = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      // under k=256 every sketch is the exact distinct set
      assert(r.getLong(2) === exactByType(ta), s"est_a $ta")
      assert(r.getLong(3) === exactByType(tb), s"est_b $tb")
      val exactUnion = ev.filter(col("event_type").isin(ta, tb))
        .select("user_id").distinct().count()
      assert(r.getLong(4) === exactUnion, s"union $ta/$tb")
      assert(r.getLong(5) === r.getLong(2) + r.getLong(3) - exactUnion)
    }
  }

  test("q100 estimate-vs-exact demo: grouped sketch estimates track countDistinct on lineitem") {
    // the comparison q100 used to carry in-catalog (r13 split moved it
    // here): per-group KMV estimates vs the exact Expand-based distinct
    // counts, within 3 standard errors (se ~ exact/sqrt(k-2)); exact
    // whenever the group's distinct count sits under k
    val k = 1024
    val li = Queries.t(spark, "/root/testdata/sf0.001", "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        KmvSketch.kmvMinHashes(KmvSketch.hash(col("l_partkey")), k).as("mh"),
        countDistinct(col("l_partkey")).as("exact"))
      .select(col("l_returnflag"),
        KmvSketch.kmvEstimate("mh", k).as("est"), col("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      if (exact < k) assert(est === exact, s"under-k group must be exact: $r")
      else assert(math.abs(est - exact) <= 3 * exact / math.sqrt(k - 2.0),
        s"estimate outside 3 standard errors: $r")
    }
  }

  test("hash: pre-reduction keeps any nonnegative long in-domain (no silent overflow)") {
    // inputs far beyond the old ~9e9 advisory limit: the pre-reduce mod P
    // makes Spark's result equal the direct BigInt arithmetic (the
    // un-reduced form wrapped Long and diverged from DuckDB's error)
    val xs = Seq(0L, 1L, KmvSketch.P - 1, KmvSketch.P, 24000000000L,
      Long.MaxValue / 2, Long.MaxValue)
    val got = xs.toDF("x").select(KmvSketch.hash(col("x")).as("h"))
      .collect().map(_.getLong(0))
    val want = xs.map { x =>
      val p = BigInt(KmvSketch.P)
      (((BigInt(x) % p) * KmvSketch.A1 + KmvSketch.B1) % p * KmvSketch.A2 +
        KmvSketch.B2) % p
    }.map(_.toLong)
    assert(got.toSeq === want)
    // and inputs under P are bit-unchanged vs the pre-r14 formulation
    val small = Seq(42L, 999999999L)
    val legacy = small.map(x =>
      ((x * KmvSketch.A1 + KmvSketch.B1) % KmvSketch.P * KmvSketch.A2 +
        KmvSketch.B2) % KmvSketch.P)
    val now = small.toDF("x").select(KmvSketch.hash(col("x")).as("h"))
      .collect().map(_.getLong(0))
    assert(now.toSeq === legacy)
  }

  test("kmv set-op closure: k-min of a union is recoverable from the two k-min lists") {
    // adversarial: sets bigger than k, heavy overlap — the in-row merge
    // must equal the sketch of the concatenated input
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.KmvSketch
    val k = 16
    val a = (0L until 500L).toDF("x")
    val b = (250L until 900L).toDF("x")
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(KmvSketch.kmvMinHashes(KmvSketch.hash(col("x")), k).as("mh"))
        .collect()(0).getSeq[Long](0)
    val merged = (sk(a) ++ sk(b)).distinct.sorted.take(k)
    val direct = sk(a.union(b))
    assert(merged === direct)
  }
}
