package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.ChangeCapture

/** Contract for snapshot change capture (q116): classification of
  * added/removed/changed keys, null-safe value comparison, and silence
  * on unchanged keys.
  */
class ChangeCaptureSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v1", StringType),
    StructField("v2", IntegerType)))

  private def df(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  test("added, removed, changed, and unchanged classified correctly") {
    val oldSnap = df(
      Row(1L, "a", Int.box(10)),   // unchanged
      Row(2L, "b", Int.box(20)),   // changed (v2)
      Row(3L, "c", Int.box(30)))   // removed
    val newSnap = df(
      Row(1L, "a", Int.box(10)),
      Row(2L, "b", Int.box(21)),
      Row(4L, "d", Int.box(40)))   // added
    val out = ChangeCapture.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("null-vs-value and value-vs-null both classify as changed; null-vs-null does not") {
    val oldSnap = df(
      Row(1L, null, Int.box(1)),
      Row(2L, "x", Int.box(2)),
      Row(3L, null, Int.box(3)))
    val newSnap = df(
      Row(1L, "now-set", Int.box(1)),
      Row(2L, null, Int.box(2)),
      Row(3L, null, Int.box(3)))
    val out = ChangeCapture.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "changed", 2L -> "changed"))
  }

  test("round trip: applyDelta(prev, snapshotDelta(prev, cur)) == cur exactly") {
    val prev = df(
      Row(1L, "a", Int.box(10)),     // unchanged
      Row(2L, "b", Int.box(20)),     // changed value
      Row(3L, "c", Int.box(30)),     // removed
      Row(5L, "e", null),            // null -> value transition
      Row(6L, null, Int.box(60)))    // value -> null transition
    val cur = df(
      Row(1L, "a", Int.box(10)),
      Row(2L, "b", Int.box(21)),
      Row(4L, "d", Int.box(40)),     // added
      Row(5L, "e", Int.box(50)),
      Row(6L, null, null))
    val delta = ChangeCapture.snapshotDelta(prev, cur, Seq("k"), Seq("v1", "v2"))
    val next = ChangeCapture.applyDelta(prev, delta, Seq("k"), Seq("v1", "v2"))
    assert(next.collect().map(_.toSeq).toSet === cur.collect().map(_.toSeq).toSet)
  }

  test("delta carries the new values; removed rows carry nulls") {
    val prev = df(Row(1L, "a", Int.box(1)), Row(2L, "b", Int.box(2)))
    val cur = df(Row(1L, "a2", Int.box(1)))
    val delta = ChangeCapture.snapshotDelta(prev, cur, Seq("k"), Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(delta(1L) === Seq("changed", "a2", 1))
    assert(delta(2L) === Seq("removed", null, null))
  }

  test("empty delta applies as identity; apply is idempotent on the same delta") {
    val prev = df(Row(1L, "a", Int.box(1)), Row(2L, "b", Int.box(2)))
    val empty = ChangeCapture.snapshotDelta(prev, prev, Seq("k"), Seq("v1", "v2"))
    assert(empty.isEmpty)
    val same = ChangeCapture.applyDelta(prev, empty, Seq("k"), Seq("v1", "v2"))
    assert(same.collect().map(_.toSeq).toSet === prev.collect().map(_.toSeq).toSet)
    val cur = df(Row(2L, "b2", Int.box(2)), Row(3L, "c", Int.box(3)))
    val delta = ChangeCapture.snapshotDelta(prev, cur, Seq("k"), Seq("v1", "v2"))
    val once = ChangeCapture.applyDelta(prev, delta, Seq("k"), Seq("v1", "v2"))
    val twice = ChangeCapture.applyDelta(once, delta, Seq("k"), Seq("v1", "v2"))
    assert(twice.collect().map(_.toSeq).toSet ===
      cur.collect().map(_.toSeq).toSet)
  }

  test("q125 on the real snapshot: applied == the new snapshot bit-for-bit") {
    import org.apache.spark.sql.functions._
    val customer = Queries.t(spark, "/root/testdata/sf0.001", "customer")
    val applied = ChangeCapture.customerApplyDelta(customer)
      .collect().map(_.toSeq).toSet
    val newSnap = customer.filter(col("c_custkey") % 89 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 31 === 0, col("c_acctbal") + 1)
          .otherwise(col("c_acctbal")))
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .collect().map(_.toSeq).toSet
    assert(applied === newSnap)
    assert(applied.nonEmpty)
  }

  test("q116 on the real snapshot: every class present, counts match the residue classes") {
    val customer = Queries.t(spark, "/root/testdata/sf0.001", "customer")
    val out = ChangeCapture.customerDiff(customer).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    import org.apache.spark.sql.functions._
    // a key divisible by BOTH 97 and 89 (e.g. custkey 0) is absent from
    // both snapshots - neither added nor removed
    val n97 = customer.filter(col("c_custkey") % 97 === 0 &&
      col("c_custkey") % 89 =!= 0).count()
    val n89 = customer.filter(col("c_custkey") % 89 === 0 &&
      col("c_custkey") % 97 =!= 0).count()
    val n31 = customer.filter(col("c_custkey") % 31 === 0 &&
      col("c_custkey") % 97 =!= 0 && col("c_custkey") % 89 =!= 0).count()
    assert(out.getOrElse("added", 0L) === n97)
    assert(out.getOrElse("removed", 0L) === n89)
    assert(out.getOrElse("changed", 0L) === n31)
    assert(out.values.sum > 0)
  }
}
