package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.SparkSpec

class StreamingEtlSpec extends SparkSpec {

  private val loanSchema = StructType(Seq(
    StructField("loan_id", StringType),
    StructField("amount", DoubleType),
    StructField("status", StringType)))

  test("file stream: exactly-once per file across restarts (ST3) + glob admission (ST5)") {
    val in = tmpDir("stream-in")
    val out = tmpDir("stream-out")
    val ckpt = tmpDir("stream-ckpt")

    writeFile(in, "loan_a.csv", "loan_id,amount,status\nL1,100.0,APPROVED\nL2,200.0,PENDING\n")
    writeFile(in, "loan_b.csv", "loan_id,amount,status\nL3,300.0,APPROVED\n")
    writeFile(in, "notes.txt", "not admitted\n")
    writeFile(in, "other_x.csv", "loan_id,amount,status\nL9,1.0,REJECTED\n")

    def drain(): Unit = StreamingEtl.runAvailableNow(
      StreamingEtl.csvFileStream(spark, in.toString, loanSchema),
      out.toString, ckpt.toString)

    drain()
    val first = spark.read.schema(loanSchema).parquet(out.toString)
    assert(first.count() == 3) // loan_a + loan_b; txt and other_x rejected by glob

    // re-run with nothing new: no duplicates (the checkpoint is the ledger)
    drain()
    assert(spark.read.schema(loanSchema).parquet(out.toString).count() == 3)

    // a late-arriving file is picked up exactly once
    writeFile(in, "loan_c.csv", "loan_id,amount,status\nL4,400.0,APPROVED\nL5,500.0,PENDING\n")
    drain()
    val all = spark.read.schema(loanSchema).parquet(out.toString)
    assert(all.count() == 5)
    assert(all.select("loan_id").distinct().count() == 5)
  }

  test("fixed-interval trigger (ST1): ProcessingTime query processes files and stops cleanly") {
    val in = tmpDir("pt-in")
    val out = tmpDir("pt-out")
    val ckpt = tmpDir("pt-ckpt")
    writeFile(in, "loan_a.csv", "loan_id,amount,status\nL1,100.0,APPROVED\n")
    val q = StreamingEtl.startProcessingTime(
      StreamingEtl.csvFileStream(spark, in.toString, loanSchema),
      out.toString, ckpt.toString, interval = "1 second")
    try q.processAllAvailable()
    finally q.stop()
    assert(spark.read.schema(loanSchema).parquet(out.toString).count() == 1)
  }

  test("streaming windowed aggregate equals the batch answer on the same data") {
    val in = tmpDir("win-in")
    val events = graft.Queries.t(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    events.coalesce(2).write.mode("overwrite").json(in.toString)
    val schema = events.schema

    val sq = StreamingEtl
      .windowedCounts(StreamingEtl.jsonFileStream(spark, in.toString, schema))
      .writeStream
      .format("memory")
      .queryName("win_counts")
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    sq.awaitTermination()

    val streamed = spark.table("win_counts")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = StreamingEtl.windowedCounts(events)
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("session windows: batch q43 result matches q27's session counts per user") {
    val sessions = graft.SparkEntry.queries("q43_session_window")(
      spark, "/root/testdata/sf0.001")
    val q27 = graft.SparkEntry.queries("q27_sessionize")(
      spark, "/root/testdata/sf0.001")
    // q27 counts sessions with a strict > gap predicate; q43 (native
    // session_window) uses >= — counts agree unless an exact-30-min gap
    // exists, which we assert directly by comparing totals.
    val byUser = sessions.groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_sessions"),
        sum("n_events").as("n_events"))
      .orderBy("user_id").collect().toSeq
    val expected = q27.select("user_id", "n_sessions", "n_events")
      .orderBy("user_id").collect().toSeq
    assert(byUser == expected)
  }

  test("stream-stream interval join matches the batch join on the same data") {
    val events = graft.Queries.t(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type")
    val clicksB = events.filter(col("event_type") === "click")
    val purchB = events.filter(col("event_type") === "purchase")

    val cDir = tmpDir("ss-clicks"); val pDir = tmpDir("ss-purch")
    clicksB.coalesce(1).write.mode("overwrite").json(cDir.toString)
    purchB.coalesce(1).write.mode("overwrite").json(pDir.toString)
    val schema = events.schema

    val joined = StreamingEtl.intervalJoin(
      StreamingEtl.jsonFileStream(spark, pDir.toString, schema),
      StreamingEtl.jsonFileStream(spark, cDir.toString, schema))
    val sq = joined.writeStream
      .format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    sq.awaitTermination()

    val streamed = spark.table("ss_join")
      .orderBy("event_id", "click_id").collect().toSeq
    val batch = StreamingEtl.intervalJoin(purchB, clicksB)
      .orderBy("event_id", "click_id").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming dedup within watermark drops repeated keys") {
    val in = tmpDir("dedup-in")
    val out = tmpDir("dedup-out")
    val ckpt = tmpDir("dedup-ckpt")
    // two files carrying overlapping event ids (a re-delivered batch)
    writeFile(in, "loan_a.csv",
      "loan_id,amount,status\nL1,100.0,APPROVED\nL2,200.0,PENDING\n")
    writeFile(in, "loan_b.csv",
      "loan_id,amount,status\nL2,200.0,PENDING\nL3,300.0,APPROVED\n")
    val withTs = StreamingEtl
      .csvFileStream(spark, in.toString, loanSchema)
      .withColumn("ingest_ts", current_timestamp())
    val deduped = StreamingEtl.dedupWithinWatermark(
      withTs, "ingest_ts", "10 minutes", Seq("loan_id"))
    StreamingEtl.runAvailableNow(deduped, out.toString, ckpt.toString)
    val rows = spark.read.parquet(out.toString)
    assert(rows.count() == 3)
    assert(rows.select("loan_id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted.toSeq == Seq("L1", "L2", "L3"))
  }

  test("flatMapGroupsWithState running totals match batch groupBy") {
    import spark.implicits._
    val in = tmpDir("state-in")
    val events = graft.Queries.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("event_id"), col("value"))
    events.coalesce(1).write.mode("overwrite").json(in.toString)
    val schema = events.schema

    val typed = StreamingEtl.jsonFileStream(spark, in.toString, schema)
      .as[StreamingEtl.UserEvent]
    val sq = StreamingEtl.runningUserTotals(typed)
      .writeStream
      .format("memory")
      .queryName("user_totals")
      .outputMode(OutputMode.Update)
      .trigger(Trigger.AvailableNow())
      .start()
    sq.awaitTermination()

    // take each user's LAST emitted update (one micro-batch here, but be
    // robust to maxFilesPerTrigger splits)
    val got = spark.table("user_totals")
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"),
        round(max("sum_value"), 4).as("sum_value"))
      .orderBy("user_id").collect().toSeq
    val expected = events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .orderBy("user_id").collect().toSeq
    assert(got == expected)
  }
}
