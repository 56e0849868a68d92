package graft

import org.apache.spark.sql.functions._

/** q25 (MinHash/LSH near-dup) quality + plan-shape checks against the exact
  * q23 baseline on the smallest testdata scale.
  */
class MinHashLshSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select(col("doc_a"), col("doc_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  test("q25 LSH recall vs exact q23 is >= 0.99 at threshold 0.5") {
    val exact = pairs("q23_ngram_jaccard")
    val lsh = pairs("q25_minhash_lsh")
    assert(exact.nonEmpty, "exact baseline found no pairs — test data changed?")
    // b=32 bands of r=2: P(miss | j=0.5) = 0.75^32 ~ 1e-4; nearly all pairs
    // here sit well above the threshold, so observed recall should be ~1.
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.99, s"recall $recall: missed ${(exact -- lsh).size} of ${exact.size}")
    // precision is 1.0 by construction: candidates are verified with the
    // same exact jaccard + threshold the baseline uses.
    assert((lsh -- exact).isEmpty, "LSH emitted a pair the exact baseline did not")
  }

  test("q25 physical plan has no nested-loop or cartesian join") {
    val plan = SparkEntry.queries("q25_minhash_lsh")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "plan fell back to BNLJ")
    assert(!plan.contains("CartesianProduct"), "plan fell back to cartesian")
  }

  test("q23 inverted-index plan has no nested-loop or cartesian join") {
    val plan = SparkEntry.queries("q23_ngram_jaccard")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "plan fell back to BNLJ")
    assert(!plan.contains("CartesianProduct"), "plan fell back to cartesian")
  }
}
