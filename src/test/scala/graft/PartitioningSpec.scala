package graft

import org.apache.spark.sql.functions._

/** Hive-style partitioned layout + partition pruning — at 100 TB, a
  * filter on the partition column must skip whole directories, not scan
  * and discard.
  */
class PartitioningSpec extends SparkSpec {

  test("partitionBy write + filtered read prunes to matching partitions only") {
    val dir = tmpDir("part-lineitem")
    val li = Queries.t(spark, "/root/testdata/sf0.001", "lineitem")
    li.write.mode("overwrite")
      .partitionBy("l_returnflag")
      .parquet(dir.toString)

    val flags = li.select("l_returnflag").distinct().count()
    assert(flags >= 2, "need multiple partitions for the test to mean anything")

    val pruned = spark.read.parquet(dir.toString)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = pruned.queryExecution.executedPlan.toString
    // the filter lands in PartitionFilters (dir-level skip), not a scan filter
    assert(plan.contains("PartitionFilters"), plan)
    assert(
      plan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*l_returnflag[^\\]]*\\].*"),
      s"partition filter not applied at dir level:\n$plan")

    // correctness: identical rows to the unpartitioned filter
    val expected = li.filter(col("l_returnflag") === "R").count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("partition column round-trips; non-partition filters still push to parquet") {
    val dir = tmpDir("part-orders")
    Queries.t(spark, "/root/testdata/sf0.001", "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir.toString)
    val df = spark.read.parquet(dir.toString)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 1000.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_totalprice"), plan)
    assert(df.count() > 0)
  }
}
