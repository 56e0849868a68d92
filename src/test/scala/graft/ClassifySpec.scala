package graft

import org.apache.spark.sql.functions._

import graft.ops.Classify

/** q96 NB classifier contracts: perfect separation on a
  * disjoint-vocabulary fixture, hand-checked scores, above-majority
  * accuracy on the real corpus, partition independence, and totality on
  * null text. The DuckDB hash-compare replays training + inference.
  */
class ClassifySpec extends SparkSpec {

  private lazy val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")

  test("disjoint vocabularies classify perfectly; ties break to the smaller label") {
    import spark.implicits._
    val base = Seq(
      (0L, "aa", "alpha beta alpha"),
      (1L, "aa", "alpha beta beta"),
      (2L, "bb", "gamma delta gamma"),
      (3L, "bb", "delta delta gamma"),
      (4L, "aa", "alpha alpha beta"),   // clearly class-aa phrasing
      (5L, "bb", "gamma delta delta"))  // clearly class-bb phrasing
      .toDF("doc_id", "lang", "text")
    val out = Classify.nbClassify(base).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getInt(4))).toMap
    assert(out.values.forall(_._2 == 1), out.toString) // all correct
    // no-token docs score priors only; with equal priors every class
    // ties and the lexicographically smallest label wins
    val tied = Seq((0L, "aa", "alpha"), (1L, "bb", "gamma"),
      (2L, "aa", null: String), (3L, "bb", null: String))
      .toDF("doc_id", "lang", "text")
    val u = Classify.nbClassify(tied).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(u(2L) === "aa" && u(3L) === "aa")
  }

  test("hand-checked scores: quantized log-posterior arithmetic") {
    import spark.implicits._
    val base = Seq(
      (0L, "aa", "x x y"),
      (1L, "bb", "y z"))
      .toDF("doc_id", "lang", "text")
    val out = Classify.nbClassify(base).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // model: V=3; aa: c(x)=2, c(y)=1, N=3; bb: c(y)=1, c(z)=1, N=2
    // priors: ln(1/2) each
    def fq(x: Double): Long = math.floor(x * 10000.0 + 0.5).toLong
    def q(c: Long, n: Long): Long = fq(math.log(c + 1.0) - math.log(n + 3.0))
    val prior = fq(math.log(1.0) - math.log(2.0))
    // doc 0 = x x y under aa: prior + 2*q(2,3) + q(1,3)
    val s0aa = prior + 2 * q(2, 3) + q(1, 3)
    val s0bb = prior + 2 * q(0, 2) + q(1, 2)
    assert(s0aa > s0bb)
    assert(out.find(_._1 == 0L).get._4 === s0aa)
    // doc 1 = y z under bb: prior + q(1,2) + q(1,2)
    val s1bb = prior + 2 * q(1, 2)
    val s1aa = prior + q(1, 3) + q(0, 3)
    assert(s1bb > s1aa)
    assert(out.find(_._1 == 1L).get._4 === s1bb)
  }

  test("beats the majority-class baseline on the real corpus") {
    val out = Classify.nbClassify(docs).collect()
    val acc = out.map(_.getInt(4)).sum.toDouble / out.length
    val majority = docs.groupBy("lang").count()
      .agg(max("count")).collect()(0).getLong(0).toDouble / out.length
    assert(acc > majority, s"NB accuracy $acc <= majority baseline $majority")
    info(f"accuracy $acc%.3f vs majority $majority%.3f")
  }

  test("partition-independent and total on null text") {
    import spark.implicits._
    val base = Seq(
      (0L, "aa", "alpha beta"), (1L, "bb", "gamma delta"),
      (2L, "aa", null: String), (3L, "bb", "gamma"))
      .toDF("doc_id", "lang", "text")
    val a = Classify.nbClassify(base.repartition(1)).collect().toSeq
    val b = Classify.nbClassify(base.repartition(5)).collect().toSeq
    assert(a === b)
    // the null-text doc is present, scored on priors alone
    assert(a.exists(_.getLong(0) == 2L))
  }

  test("plan: model grid broadcast to the token stream; no cartesian of real tables") {
    val df = Classify.nbClassify(docs)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
