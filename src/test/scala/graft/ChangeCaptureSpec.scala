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

  // ------------------------------------------------------- SCD2 (q143)

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("ts", TimestampType)))

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  private def events(rows: (Long, Long, String, Long)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(
        rows.map(r => Row(r._1, r._2, r._3, ts(r._4))): _*), evSchema)

  test("scd2: consecutive duplicate states collapse into one episode") {
    // user 1: A A B A  ->  episodes A[t1,t3) B[t3,t4) A[t4,null)
    val out = ChangeCapture.scd2FromEvents(events(
      (1L, 1L, "A", 10L), (2L, 1L, "A", 20L),
      (3L, 1L, "B", 30L), (4L, 1L, "A", 40L)))
      .collect()
      .map(r => (r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime / 1000, Option(r.getTimestamp(4)).map(_.getTime / 1000),
        r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1L, "A", 10L, Some(30L), false),
      (3L, "B", 30L, Some(40L), false),
      (4L, "A", 40L, None, true)))
  }

  test("scd2: intervals chain per user — valid_to = next valid_from, exactly one current") {
    val out = ChangeCapture.scd2FromEvents(
      Queries.t(spark, "/root/testdata/sf0.001", "events"))
      .collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      // output order within a user is (valid_from, event_id)
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(4) === b.getTimestamp(3),
            "valid_to must equal the next episode's valid_from")
          assert(!a.getBoolean(5))
        case _ =>
      }
      assert(rows.last.isNullAt(4) && rows.last.getBoolean(5),
        "exactly the last episode is current")
    }
  }

  test("scd2: null user_id rows are dropped, not collapsed into a pseudo-user") {
    val rows = java.util.Arrays.asList(
      Row(1L, null, "A", ts(10L)), Row(2L, null, "B", ts(20L)),
      Row(3L, 1L, "A", ts(30L)))
    val out = ChangeCapture.scd2FromEvents(
      spark.createDataFrame(rows, evSchema)).collect()
    assert(out.length === 1, "null-user events must not form episodes")
    assert(out.head.getLong(0) === 1L && out.head.getLong(1) === 3L)
  }

  test("scd2: same-timestamp changes tie-break by event_id") {
    val out = ChangeCapture.scd2FromEvents(events(
      (5L, 2L, "Y", 10L), (4L, 2L, "X", 10L)))
      .collect()
      .map(r => (r.getLong(1), r.getString(2), Option(r.getTimestamp(4)).isEmpty))
    assert(out.toSeq === Seq((4L, "X", false), (5L, "Y", true)))
  }
}
