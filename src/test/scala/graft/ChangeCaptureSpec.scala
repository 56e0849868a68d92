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
