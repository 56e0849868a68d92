package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSpec

/** StableCsvSource: ST4 min-age stabilization as a streaming property —
  * young files are DEFERRED (not lost), stable files flow exactly once,
  * restarts replay from the admission log, and the CSV decode honors
  * RFC 4180 quoting.
  */
class StableCsvSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("loan_id", LongType),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  private def drain(in: java.nio.file.Path, out: java.nio.file.Path,
      ckpt: java.nio.file.Path, minAgeMs: Long): Unit = {
    val df = StreamingEtl.stableCsvStream(
      spark, in.toString, schema, java.time.Duration.ofMillis(minAgeMs))
    val q = df.writeStream
      .format("parquet").option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def results(out: java.nio.file.Path): Set[(Long, String, Double)] =
    spark.read.schema(schema).parquet(out.toString)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("young files are deferred, then admitted exactly once after stabilizing") {
    val in = tmpDir("scsv-in"); val out = tmpDir("scsv-out"); val ckpt = tmpDir("scsv-ckpt")
    // minAge must dwarf any realistic drain duration: AvailableNow can
    // poll latestOffset more than once, and with a small threshold a
    // slow drain would age the "young" file past it mid-test (flake)
    val minAge = 300000L // 5 min
    val old = writeFile(in, "loan_old.csv", "loan_id,name,amount\n1,alice,100.5\n")
    val young = writeFile(in, "loan_young.csv", "loan_id,name,amount\n2,bob,200.25\n")
    old.toFile.setLastModified(System.currentTimeMillis() - 2 * minAge)

    drain(in, out, ckpt, minAgeMs = minAge)
    assert(results(out) == Set((1L, "alice", 100.5)),
      s"young file not deferred: ${results(out)}")

    // stabilize the young file -> next drain admits it, exactly once
    young.toFile.setLastModified(System.currentTimeMillis() - 2 * minAge)
    drain(in, out, ckpt, minAgeMs = minAge)
    assert(results(out) == Set((1L, "alice", 100.5), (2L, "bob", 200.25)))

    // re-drain with nothing new: no re-admission
    drain(in, out, ckpt, minAgeMs = minAge)
    assert(results(out) == Set((1L, "alice", 100.5), (2L, "bob", 200.25)))
    assert(spark.read.schema(schema).parquet(out.toString).count() == 2,
      "a file was admitted twice")
  }

  test("glob admission and RFC 4180 quoted fields") {
    val in = tmpDir("scsv2-in"); val out = tmpDir("scsv2-out"); val ckpt = tmpDir("scsv2-ckpt")
    val f = writeFile(in, "loan_q.csv",
      "loan_id,name,amount\n3,\"smith, \"\"jr\"\"\",42.0\n")
    val skipped = writeFile(in, "other.csv", "loan_id,name,amount\n9,nope,1.0\n")
    f.toFile.setLastModified(System.currentTimeMillis() - 60000)
    skipped.toFile.setLastModified(System.currentTimeMillis() - 60000)
    drain(in, out, ckpt, minAgeMs = 0)
    assert(results(out) == Set((3L, "smith, \"jr\"", 42.0)))
  }

  test("restart replays from the admission log, no duplicates across checkpoints") {
    val in = tmpDir("scsv3-in"); val out = tmpDir("scsv3-out"); val ckpt = tmpDir("scsv3-ckpt")
    val f1 = writeFile(in, "loan_a.csv", "loan_id,name,amount\n10,x,1.0\n")
    f1.toFile.setLastModified(System.currentTimeMillis() - 60000)
    drain(in, out, ckpt, minAgeMs = 1000)
    // a second file lands; the NEW source instance (fresh drain = fresh
    // MicroBatchStream) must rebuild its admitted set from the log
    val f2 = writeFile(in, "loan_b.csv", "loan_id,name,amount\n11,y,2.0\n")
    f2.toFile.setLastModified(System.currentTimeMillis() - 60000)
    drain(in, out, ckpt, minAgeMs = 1000)
    assert(results(out) == Set((10L, "x", 1.0), (11L, "y", 2.0)))
    assert(spark.read.schema(schema).parquet(out.toString).count() == 2)
  }

  test("maxFilesPerTrigger bounds admission per poll; backlog drains across triggers") {
    val in = tmpDir("scsv4-in"); val out = tmpDir("scsv4-out"); val ckpt = tmpDir("scsv4-ckpt")
    (1 to 3).foreach { i =>
      writeFile(in, s"loan_$i.csv", s"loan_id,name,amount\n${i}0,n$i,$i.0\n")
        .toFile.setLastModified(System.currentTimeMillis() - 60000)
    }
    def drainCapped(): Unit = {
      val df = spark.readStream
        .format(StableCsvSource.ProviderClass)
        .schema(schema)
        .option("path", in.toString)
        .option("minAgeMs", "0")
        .option("pathGlobFilter", "loan_*.csv")
        .option("header", "true")
        .option("maxFilesPerTrigger", "1")
        .option("compactInterval", "1") // compact on every commit so the assertions below see a snapshot
        .load()
      val q = df.writeStream
        .format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainCapped()
    val afterOne = spark.read.schema(schema).parquet(out.toString).count()
    assert(afterOne < 3, s"cap ignored: $afterOne files' rows after one poll cycle")
    drainCapped(); drainCapped()
    assert(results(out) == Set((10L, "n1", 1.0), (20L, "n2", 2.0), (30L, "n3", 3.0)))
    assert(spark.read.schema(schema).parquet(out.toString).count() == 3, "duplicate admission")
    // commit() compacts: committed chunks fold into ONE snapshot. Spark
    // delivers a batch's source-commit while starting the NEXT batch, so
    // the newest batch's chunk is legitimately still uncompacted — the
    // bound is snapshot + O(1) tail chunks, not zero (3 polls would
    // otherwise leave 3 chunks and no snapshot).
    import scala.jdk.CollectionConverters._
    val logDir = java.nio.file.Files.walk(ckpt).iterator().asScala
      .find(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString == "graft-admitted")
      .getOrElse(fail("admission log dir not found"))
    val entries = java.nio.file.Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(entries.count(_.startsWith("snapshot-")) == 1,
      s"expected exactly one snapshot after commits: $entries")
    assert(entries.count(n => n.nonEmpty && n.forall(_.isDigit)) <= 1,
      s"committed chunks not compacted away: $entries")
  }

  test("an orphan .tmp chunk from a crash mid-publish does not wedge recovery") {
    val in = tmpDir("scsv6-in"); val out = tmpDir("scsv6-out"); val ckpt = tmpDir("scsv6-ckpt")
    val f1 = writeFile(in, "loan_a.csv", "loan_id,name,amount\n1,a,1.0\n")
    f1.toFile.setLastModified(System.currentTimeMillis() - 60000)
    drain(in, out, ckpt, minAgeMs = 0)
    // simulate a crash between tmp-create and rename: leave an orphan
    // .tmp in the admission log; the next (recovered) run must ignore it
    import scala.jdk.CollectionConverters._
    val logDir = java.nio.file.Files.walk(ckpt).iterator().asScala
      .find(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString == "graft-admitted")
      .getOrElse(fail("admission log dir not found"))
    java.nio.file.Files.writeString(logDir.resolve(".7.tmp"), "garbage")
    val f2 = writeFile(in, "loan_b.csv", "loan_id,name,amount\n2,b,2.0\n")
    f2.toFile.setLastModified(System.currentTimeMillis() - 60000)
    drain(in, out, ckpt, minAgeMs = 0)
    assert(results(out) == Set((1L, "a", 1.0), (2L, "b", 2.0)))
  }

  test("quoted fields with embedded newlines parse as one row (univocity decode)") {
    val in = tmpDir("scsv5-in"); val out = tmpDir("scsv5-out"); val ckpt = tmpDir("scsv5-ckpt")
    val f = writeFile(in, "loan_nl.csv",
      "loan_id,name,amount\n7,\"two\nlines\",3.5\n8,plain,4.0\n")
    f.toFile.setLastModified(System.currentTimeMillis() - 60000)
    // a header-only file must admit cleanly and contribute zero rows
    writeFile(in, "loan_empty.csv", "loan_id,name,amount\n")
      .toFile.setLastModified(System.currentTimeMillis() - 60000)
    drain(in, out, ckpt, minAgeMs = 0)
    assert(results(out) == Set((7L, "two\nlines", 3.5), (8L, "plain", 4.0)))
  }
}
