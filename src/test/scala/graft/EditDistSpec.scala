package graft

import org.apache.spark.sql.functions._

import graft.ops.EditDist

/** q97 bounded edit-distance near-dup contracts: equality with a
  * driver-side brute force on the real corpus (the PassJoin filter is
  * lossless), planted boundary pairs at ed == d and ed == d+1, the
  * short-string brute leg, partition independence, and the
  * no-cartesian plan shape.
  */
class EditDistSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Queries.t(spark, sf, "documents")

  /** Textbook O(n·m) Levenshtein, independent of both engines. */
  private def lev(a: String, b: String): Int = {
    val m = b.length
    var prev = (0 to m).toArray
    for (i <- 1 to a.length) {
      val cur = new Array[Int](m + 1)
      cur(0) = i
      for (j <- 1 to m) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      prev = cur
    }
    prev(m)
  }

  test("equals a driver-side brute force on the real corpus") {
    val d = 4
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = (for {
      (i, ti) <- texts; (j, tj) <- texts
      if i < j && math.abs(ti.length - tj.length) <= d
      e = lev(ti, tj) if e <= d
    } yield (i, j, e.toLong)).sortBy(t => (t._1, t._2)).toSeq
    val got = EditDist.editDistPairs(docs, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(expected.nonEmpty, "fixture should contain near-edit pairs")
  }

  test("boundary pairs: ed == d kept with exact distance, ed == d+1 dropped") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val at4 = "THE quick brown fox jumps over the lazy dog again and AGAIN".toLowerCase
    // 4 substitutions spread across segments
    val ed4 = base.updated(0, 'x').updated(15, 'x').updated(30, 'x').updated(45, 'x')
    val ed5 = ed4.updated(50, 'x')
    val df = Seq(1L -> base, 2L -> ed4, 3L -> ed5, 4L -> at4).toDF("doc_id", "text")
    val out = EditDist.editDistPairs(df, d = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lev(base, ed4) === 4 && lev(base, ed5) === 5)
    assert(out.contains((1L, 2L, 4L)))
    assert(!out.exists(p => p._1 == 1L && p._2 == 3L))
    // ed4 vs ed5 differ by exactly the one extra substitution
    assert(out.contains((2L, 3L, 1L)))
    assert(out.contains((1L, 4L, 0L))) // identical after normalization
  }

  test("short strings pair through the brute leg; legs stay disjoint") {
    import spark.implicits._
    val df = Seq(
      1L -> "ab", 2L -> "b", 3L -> "abcd", 4L -> "", 5L -> "abcdefghij")
      .toDF("doc_id", "text")
    val out = EditDist.editDistPairs(df, d = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = (for {
      (i, ti) <- Seq(1L -> "ab", 2L -> "b", 3L -> "abcd", 4L -> "", 5L -> "abcdefghij")
      (j, tj) <- Seq(1L -> "ab", 2L -> "b", 3L -> "abcd", 4L -> "", 5L -> "abcdefghij")
      if i < j && math.abs(ti.length - tj.length) <= 2
      e = lev(ti, tj) if e <= 2
    } yield (i, j, e.toLong)).toSet
    assert(out === expected)
    assert(out.contains((1L, 2L, 1L)))
  }

  test("result is independent of input partitioning") {
    val a = EditDist.editDistPairs(docs, 4).collect().toSeq
    val b = EditDist.editDistPairs(docs.repartition(7), 4).collect().toSeq
    assert(a === b)
  }

  test("plan: candidate joins are equi-joins — no cartesian, no BNLJ") {
    val out = EditDist.editDistPairs(docs, 4)
    out.collect()
    val executed = out.queryExecution.executedPlan
    def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(all)) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => all(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => all(q.plan)
        case _ => Nil
      })
    val nodes = all(executed).map(_.nodeName)
    assert(!nodes.exists(n => n.contains("CartesianProduct") || n.contains("BroadcastNestedLoop")), nodes.distinct.mkString(","))
  }
}
