package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Regression guard for the events.ts read boundary.
  *
  * The driver has regenerated /root/testdata across rounds with three
  * different physical encodings for events.ts: parquet TIMESTAMP(NANOS)
  * (arrives as LongType under spark.sql.legacy.parquet.nanosAsLong), parquet
  * timestamp[us] with isAdjustedToUTC=false (arrives as TIMESTAMP_NTZ), and
  * plain TIMESTAMP. A silent switch between them once broke three catalog
  * queries and six specs at analysis time (round 10). This spec pins the
  * contract: Queries.t("events") always yields session-zoned TimestampType,
  * value-identical across shapes, for BOTH the shipped testdata and
  * synthetic copies of each shape — so the next regeneration fails loudly
  * here instead of as scattered DATATYPE_MISMATCH errors.
  */
class EventTsNormalizeSpec extends SparkSpec {

  test("shipped testdata events.ts normalizes to TimestampType") {
    val df = Queries.t(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts arrived as ${df.schema("ts").dataType}; Queries.t must normalize it")
  }

  test("all three stored shapes normalize to the same TimestampType values") {
    val dir = tmpDir("events-shapes")
    // canonical micros-precision timestamps (UTC session tz is pinned by
    // Sessions.builder, so NTZ<->TZ casts are value-preserving)
    val base = spark.range(5).select(
      col("id").as("event_id"),
      expr("timestamp_micros(1704067200000000 + id * 61000001)").as("ts"))

    // shape 1: TimestampType passthrough
    base.write.mode("overwrite").parquet(s"$dir/tz/events.parquet")
    // shape 2: TIMESTAMP_NTZ (micros, isAdjustedToUTC=false)
    base.select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    // shape 3: LongType epoch nanos — what TIMESTAMP(NANOS) data arrives as
    // under the nanosAsLong legacy read config
    base.select(col("event_id"), (unix_micros(col("ts")) * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/nanos/events.parquet")

    val results = Seq("tz", "ntz", "nanos").map { shape =>
      val df = Queries.t(spark, s"$dir/$shape", "events")
      assert(df.schema("ts").dataType == TimestampType, s"shape $shape")
      shape -> df.orderBy("event_id").select("event_id", "ts").collect().toSeq
    }.toMap

    assert(results("ntz") == results("tz"), "NTZ normalization changed values")
    assert(results("nanos") == results("tz"), "nanos normalization changed values")
    // downstream analysis-time consumers that broke in round 10 must resolve
    val ntz = Queries.t(spark, s"$dir/ntz", "events")
    ntz.select(unix_micros(col("ts"))).collect() // q39/q47/q63 call site
    ntz.withWatermark("ts", "1 minute")          // StreamingEtl call site
  }
}
