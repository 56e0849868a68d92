package graft

import org.apache.spark.sql.functions._

import graft.ops.ScaleJoins

/** Physical-layout join tools: bucketed co-located joins (exchange-free)
  * and skew salting (same rows, spread reducers).
  */
class ScaleJoinsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join with no Exchange and no per-join Sort") {
    val li = Queries.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Queries.t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    // the in-memory catalog is fresh per JVM but managed-table locations
    // survive in spark-warehouse/: clear both before (re)creating
    Seq("li_bucketed", "ord_bucketed").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    ScaleJoins.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    ScaleJoins.writeBucketed(ord, "ord_bucketed", "o_orderkey", 8)
    // force SMJ so the bucket layout (not a broadcast) carries the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ScaleJoins.bucketedJoin(
        spark, "li_bucketed", "ord_bucketed", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // correctness: same count as the plain join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted join returns exactly the rows of the unsalted join") {
    val li = Queries.t(spark, sf, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_linenumber"), col("l_quantity"))
    val dim = Queries.t(spark, sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus"))
    val plain = li.join(dim, "k")
      .orderBy("k", "l_linenumber").collect().toSeq
    val salted = ScaleJoins.saltedJoin(li, dim, "k", "l_linenumber", 8)
      .orderBy("k", "l_linenumber").collect().toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
