package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.Retrieval

/** Contract for trigram substring search (q142): result = the brute
  * contains() scan, the gram prefilter is a pure candidate generator,
  * and the exact verify is load-bearing (trigram-superset non-matches
  * are rejected).
  */
class TrigramSearchSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)

  test("matches the brute-force contains() scan on the testdata corpus") {
    val d = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val out = Retrieval.trigramSearch(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = Retrieval.DefaultSubstringQueries.flatMap { case (qid, p) =>
      d.filter(org.apache.spark.sql.functions.col("text").contains(p))
        .select("doc_id").collect().map(r => (qid, r.getLong(0)))
    }.sorted
    assert(out.toSeq === brute)
  }

  test("exact verify is load-bearing: all trigrams present but pattern absent is rejected") {
    // pattern "ab cd" has trigrams {"ab ", "b c", " cd"}; this doc
    // contains all three but never the contiguous pattern
    val d = docs(
      (1L, "xab cx cdy"),
      (2L, "ab cd here"),
      (3L, "nothing"))
    val out = Retrieval.trigramSearch(d, Seq((7L, "ab cd"))).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((7L, 2L)))
  }

  test("no-match pattern yields an empty leg without breaking other queries") {
    val d = docs((1L, "alpha beta gamma"))
    val out = Retrieval.trigramSearch(d,
      Seq((1L, "beta gam"), (2L, "zzzqqq"))).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 1L)))
  }

  test("null text rows are ignored; patterns shorter than 3 chars rejected") {
    val d = docs((1L, "abc def"), (2L, null.asInstanceOf[String]))
    val out = Retrieval.trigramSearch(d, Seq((1L, "abc"))).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 1L)))
    intercept[IllegalArgumentException] {
      Retrieval.trigramSearch(d, Seq((1L, "ab")))
    }
  }
}
