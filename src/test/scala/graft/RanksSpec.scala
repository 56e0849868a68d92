package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Ranks

/** Contract for the two-pass distributed ranking primitive: bit-equality
  * with the single-partition window forms (`row_number()/ntile(n) OVER
  * (ORDER BY ...)`) on every N mod n residue, partition-independence,
  * and the no-global-window plan shape.
  */
class RanksSpec extends SparkSpec {

  private def frame(n: Int, parts: Int = 5): DataFrame = {
    import spark.implicits._
    // keys deliberately non-contiguous and unsorted; (v, id) is total
    (0 until n).map(i => ((i * 37) % n, i.toLong)).toDF("v", "id")
      .repartition(parts)
  }

  private def windowNtile(df: DataFrame, n: Int): Map[Long, Long] =
    df.withColumn("t",
        ntile(n).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("t")).toMap

  test("ntile equals the global-window ntile on every N mod n residue") {
    for (n <- Seq(4, 3); size <- Seq(1, 2, 3, 7, 8, 40, 41, 42, 43)) {
      val df = frame(size)
      val got = Ranks.withNtile(df, n, Seq(asc("v"), asc("id")), "t")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("t")).toMap
      assert(got === windowNtile(df, n), s"n=$n size=$size")
    }
  }

  test("ntile handles N < n (each row its own tile, like SQL ntile)") {
    val df = frame(3)
    val got = Ranks.withNtile(df, 4, Seq(asc("v"), asc("id")), "t")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("t")).toMap
    assert(got === windowNtile(df, 4))
    assert(got.values.toSeq.sorted === Seq(1L, 2L, 3L))
  }

  test("global row number equals the global-window row_number") {
    val df = frame(100, parts = 9)
    val got = Ranks.withGlobalRowNumber(df, Seq(desc("v"), asc("id")), "rk")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rk")).toMap
    val want = df.withColumn("rk",
        row_number().over(Window.orderBy(desc("v"), asc("id"))).cast("long"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rk")).toMap
    assert(got === want)
    assert(got.values.toSeq.sorted === (1L to 100L))
  }

  test("grouped row number equals the group-partitioned window, totals exact") {
    import spark.implicits._
    // few groups × many rows — the regime the primitive exists for;
    // sizes chosen so groups straddle range-partition boundaries
    val df = (0 until 500).map { i =>
      (s"g${i % 3}", (i * 37) % 500, i.toLong)
    }.toDF("g", "v", "id").repartition(7)
    val got = Ranks.withGroupedRowNumber(
      df, Seq("g"), Seq(asc("v"), asc("id")), "rk", countOut = Some("n"))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rk"), r.getAs[Long]("n"))).toMap
    val w = Window.partitionBy("g").orderBy(asc("v"), asc("id"))
    val want = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rk"), r.getAs[Long]("n"))).toMap
    assert(got === want)
    // totals: groups of 500 over 3 residues -> 167/167/166
    assert(got.values.map(_._2).toSet === Set(167L, 166L))
  }

  test("grouped row number: single group degenerates to the global form") {
    import spark.implicits._
    val df = (0 until 100).map(i => ("only", (i * 7) % 100, i.toLong))
      .toDF("g", "v", "id").repartition(5)
    val got = Ranks.withGroupedRowNumber(
      df, Seq("g"), Seq(asc("v"), asc("id")), "rk")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rk")).toMap
    val want = Ranks.withGlobalRowNumber(
      df, Seq(asc("v"), asc("id")), "rk")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rk")).toMap
    assert(got === want)
  }

  test("grouped row number: NULL group keys rank as their own partition") {
    import spark.implicits._
    // a NULL group key is a valid window partition — the offsets join
    // must be null-safe or every null-keyed row silently vanishes
    val df = (0 until 120).map { i =>
      val g = if (i % 3 == 0) null else s"g${i % 3}"
      (g, (i * 37) % 120, i.toLong)
    }.toDF("g", "v", "id").repartition(7)
    val got = Ranks.withGroupedRowNumber(
      df, Seq("g"), Seq(asc("v"), asc("id")), "rk", countOut = Some("n"))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rk"), r.getAs[Long]("n"))).toMap
    val w = Window.partitionBy("g").orderBy(asc("v"), asc("id"))
    val want = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rk"), r.getAs[Long]("n"))).toMap
    assert(got.size === 120, "null-keyed rows must not be dropped")
    assert(got === want)
  }

  test("partition-independent: any input layout yields identical ranks") {
    val base = frame(83)
    val a = Ranks.withNtile(base, 4, Seq(asc("v"), asc("id")), "t")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("t"))).sorted.toSeq
    val b = Ranks.withNtile(base.repartition(1), 4, Seq(asc("v"), asc("id")), "t")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("t"))).sorted.toSeq
    val c = Ranks.withNtile(base.repartition(17, col("id")), 4,
        Seq(asc("v"), asc("id")), "t")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("t"))).sorted.toSeq
    assert(a === b)
    assert(a === c)
  }

  test("plan shape: no unpartitioned window — every Window carries the pid key") {
    val out = Ranks.withNtile(frame(100), 4, Seq(asc("v"), asc("id")), "t")
    val plan = out.queryExecution.executedPlan.toString
    // the only window is partitioned by the range-partition id; an
    // unpartitioned window plans as `Exchange SinglePartition` + Window
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.contains("Window"), plan)
  }

  // LAST in the suite: setCheckpointDir is context-global (the
  // ClustersSpec discipline) — everything after it takes the reliable
  // path, which is correct but writes checkpoint files
  test("reliable-checkpoint path (dir set): ranks bit-equal to the local path") {
    val df = frame(97)
    val local = Ranks.withNtile(df, 4, Seq(asc("v"), asc("id")), "t")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("t"))).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("ranks-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    val reliable = Ranks.withNtile(df, 4, Seq(asc("v"), asc("id")), "t")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("t"))).sorted.toSeq
    assert(reliable === local)
    import scala.jdk.CollectionConverters._
    val rddDirs = java.nio.file.Files.walk(dir).iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("rdd-")).toSeq
    assert(rddDirs.nonEmpty, "reliable path did not checkpoint")
  }

  test("withGlobalCumSums: bit-equal to the single-partition window form") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i % 7).toLong, (i % 3).toLong))
      .toDF("k", "w1", "w2").repartition(13) // scrambled layout
    val got = graft.ops.Ranks.withGlobalCumSums(
      df, Seq(col("k")), Seq("w1" -> "c1", "w2" -> "c2"))
      .select("k", "c1", "c2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val w = org.apache.spark.sql.expressions.Window.orderBy("k")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val want = df
      .withColumn("c1", sum(col("w1")).over(w))
      .withColumn("c2", sum(col("w2")).over(w))
      .select("k", "c1", "c2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq === want.toSeq)
  }

  test("withGlobalCumSums: null weights contribute zero, never a null prefix") {
    import spark.implicits._
    val df = Seq((1L, None: Option[Long]), (2L, Some(5L)), (3L, None: Option[Long]))
      .toDF("k", "w")
    val got = graft.ops.Ranks.withGlobalCumSums(df, Seq(col("k")), Seq("w" -> "c"))
      .select("k", "c").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, 0L), (2L, 5L), (3L, 5L)))
  }
}
