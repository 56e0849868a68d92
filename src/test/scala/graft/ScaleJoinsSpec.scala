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

  test("salted two-phase sum/count equals the plain aggregate") {
    val li = Queries.t(spark, sf, "lineitem")
    val salted = ScaleJoins.saltedSumCount(li, "l_returnflag", "l_quantity", 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count("l_quantity").as("c"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salted exact distinct count equals plain count_distinct (nulls included)") {
    import spark.implicits._
    val li = Queries.t(spark, sf, "lineitem")
    val salted = ScaleJoins.saltedDistinctCount(li, "l_returnflag", "l_partkey", 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = li.groupBy("l_returnflag").agg(count_distinct(col("l_partkey")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain && plain.nonEmpty)
    // null values: ignored identically on both paths
    val withNulls = Seq(("a", Some(1L)), ("a", None), ("a", Some(1L)), ("b", None))
      .toDF("k", "v")
    val s2 = ScaleJoins.saltedDistinctCount(withNulls, "k", "v", 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s2 == Map("a" -> 1L, "b" -> 0L), s2.toString)
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
