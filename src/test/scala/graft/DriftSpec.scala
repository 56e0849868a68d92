package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.ops.Drift

/** Contract for the PSI drift audit (q147): hand-checked quantized
  * contributions including the half-count smoothing path, near-zero PSI
  * on identically distributed periods, and the planted shift crossing
  * the published 0.1 "investigate" threshold.
  */
class DriftSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("v", DoubleType),
    StructField("dt", TimestampType)))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  private def df(rows: (Double, String)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, ts(r._2))): _*), schema)

  test("hand fixture: shares, ln chain, and half-count smoothing are exact") {
    // ref: 4 rows in bucket 0; cur: 2 in bucket 0, 2 in bucket 1
    val rows = Seq.fill(4)((0.5, "1997-01-01")) ++
      Seq.fill(2)((0.5, "1999-01-01")) ++ Seq.fill(2)((1.5, "1999-01-01"))
    val out = Drift.psiDrift(df(rows: _*), "v", "dt", "1998-01-01", 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // bucket 0: (2/4 - 4/4) * ln((2*4)/(4*4)) = 0.5*ln2 = 0.34657359...
    assert(out(0L) === ((4L, 2L, 346574L)))
    // bucket 1 (ref empty -> ra = 0.5): (2/4 - 0.5/4) * ln((2*4)/(0.5*4))
    //   = 0.375 * ln 4 = 0.51986038...
    assert(out(1L) === ((0L, 2L, 519860L)))
  }

  test("identical periods: every contribution is exactly zero") {
    val rows = (1 to 50).flatMap(i =>
      Seq((i * 37 % 10 + 0.5, "1997-01-01"), (i * 37 % 10 + 0.5, "1999-01-01")))
    val out = Drift.psiDrift(df(rows: _*), "v", "dt", "1998-01-01", 1.0).collect()
    assert(out.nonEmpty)
    // equal counts and equal totals: shares identical, ln(1) = 0
    assert(out.forall(_.getLong(3) === 0L))
  }

  test("empty period: psi_q is the NULL sentinel, never a cast Infinity") {
    // every row lands in the reference period -> nc = 0; the raw share
    // arithmetic would cast Infinity to Long.MaxValue — the guard must
    // emit the explicit null sentinel instead
    val rows = Seq.fill(4)((0.5, "1997-01-01")) ++ Seq.fill(2)((1.5, "1997-01-01"))
    val out = Drift.psiDrift(df(rows: _*), "v", "dt", "1998-01-01", 1.0).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.isNullAt(3)),
      "empty current period must yield null psi_q in every bucket")
  }

  test("q147: planted current-period shift crosses the 0.1 PSI threshold; clean twin does not") {
    val sf = "/root/testdata/sf0.001"
    val dirtyTotal = SparkEntry.queries("q147_psi_drift")(spark, sf)
      .collect().map(_.getLong(3)).sum
    assert(dirtyTotal > 100000L,
      s"planted drift must cross PSI 0.1 (got ${dirtyTotal / 1e6})")
    val clean = Drift.psiDrift(
      Queries.t(spark, sf, "orders"),
      "o_totalprice", "o_orderdate", "1998-01-01", 50000.0)
      .collect().map(_.getLong(3)).sum
    assert(clean < 100000L,
      s"undirtied periods must sit below PSI 0.1 (got ${clean / 1e6})")
    assert(clean < dirtyTotal / 5,
      "the detector must separate planted drift from sampling noise")
  }

  test("categorical drift: never-seen current-period category dominates the signal") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q157_categorical_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCat = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(byCat.contains("X"), "planted new category missing")
    val planted = byCat("X")
    assert(planted > 0L)
    assert(byCat.filterNot(_._1 == "X").values.forall(_ <= planted),
      "the never-seen category must carry the largest PSI contribution")
    // ref_cnt of the planted category is exactly 0 (it never existed
    // before the cut)
    val x = rows.find(_.getString(0) == "X").get
    assert(x.getLong(1) === 0L && x.getLong(2) > 0L)
  }

  test("categorical drift: identical periods contribute exactly zero") {
    import spark.implicits._
    // same category mix on both sides of the cut -> every share pair is
    // equal -> psi_q = 0 for every category
    val facts = (0 until 100).flatMap { i =>
      val cat = if (i % 3 == 0) "A" else "B"
      Seq((cat, "1997-06-01"), (cat, "1998-06-01"))
    }.toDF("status", "d").withColumn("d", col("d").cast("timestamp"))
    val out = Drift.categoricalPsiDrift(facts, "status", "d", "1998-01-01")
      .collect()
    assert(out.length === 2)
    out.foreach(r => assert(r.getLong(3) === 0L))
  }

  test("categorical drift: empty period yields the NULL sentinel") {
    import spark.implicits._
    val facts = Seq(("A", "1998-06-01"), ("B", "1998-07-01"))
      .toDF("status", "d").withColumn("d", col("d").cast("timestamp"))
    val out = Drift.categoricalPsiDrift(facts, "status", "d", "1998-01-01")
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.isNullAt(3), "empty ref period must be the NULL sentinel"))
  }

  test("ksDrift hand fixtures: identical -> 0; disjoint -> exactly 1.0; half-shift exact") {
    import spark.implicits._
    def facts(ref: Seq[Double], cur: Seq[Double]) =
      (ref.map(_ -> "1997-06-01") ++ cur.map(_ -> "1998-06-01"))
        .toDF("v", "d").withColumn("d", col("d").cast("timestamp"))
    def ks(ref: Seq[Double], cur: Seq[Double]): Long =
      Drift.ksDrift(facts(ref, cur), "v", "d", "1998-01-01")
        .collect().head.getLong(0)
    assert(ks(Seq(1, 2, 3), Seq(1, 2, 3)) === 0L)
    assert(ks(Seq(1, 2), Seq(3, 4)) === 1000000L,
      "fully separated samples attain D = 1")
    // ref {1,2,3,4}, cur {3,4,5,6}: D = |F_r - F_c| peaks at x=2: 2/4 - 0 = 0.5
    assert(ks(Seq(1, 2, 3, 4), Seq(3, 4, 5, 6)) === 500000L)
  }

  test("ksDrift: argmax value is the MIN value on deviation ties") {
    import spark.implicits._
    // ref {1,2}, cur {2,3}: deviations are 2 at v=1 (|1·2−0·2|) and 2 at
    // v=2 (|2·2−1·2|), 0 at v=3 — a genuine supremum tie; the contract
    // reports the smallest attaining value (v=1) with D = 2/4 = 0.5
    val f = (Seq(1.0, 2.0).map(_ -> "1997-06-01") ++ Seq(2.0, 3.0).map(_ -> "1998-06-01"))
      .toDF("v", "d").withColumn("d", col("d").cast("timestamp"))
    val r = Drift.ksDrift(f, "v", "d", "1998-01-01").collect().head
    assert(r.getLong(0) === 500000L && r.getDouble(1) === 1.0)
  }

  test("q160: planted shift registers on KS; the clean twin sits lower") {
    val sf = "/root/testdata/sf0.001"
    val dirty = SparkEntry.queries("q160_ks_drift")(spark, sf)
      .collect().head.getLong(0)
    val clean = Drift.ksDrift(
      Queries.t(spark, sf, "orders"),
      "o_totalprice", "o_orderdate", "1998-01-01")
      .collect().head.getLong(0)
    assert(dirty > clean, s"planted KS $dirty must exceed clean $clean")
    assert(dirty > 20000L, s"planted shift too weak to detect: $dirty")
  }
}
