package graft.ingest

import java.time.Instant

import graft.SparkSpec

/** Ledger/admission/stabilization semantics (SURVEY §2.9 ST3-ST5) and gzip
  * metrics (U1) for the ingest batch.
  */
class FileIngestSpec extends SparkSpec {

  private def setup(): (String, String, String, String) = {
    val root = tmpDir("ingest")
    val incoming = root.resolve("incoming")
    java.nio.file.Files.createDirectories(incoming)
    (incoming.toString, root.resolve("raw").toString,
      root.resolve("out").toString, root.resolve("ledger.json").toString)
  }

  private def put(dir: String, name: String, content: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, name), content)

  // mtime is "now - 10 min" relative to real clock; pass a matching `now`
  private val now = Instant.now().plusSeconds(600)

  test("pattern admission: only loan_*.csv files are processed") {
    val (incoming, raw, out, ledger) = setup()
    put(incoming, "loan_a.csv", "loan_id\n1\n")
    put(incoming, "other_b.csv", "x\n2\n")
    put(incoming, "loan_c.txt", "y\n3\n")
    val res = FileIngest.processBatch(incoming, raw, out, ledger, now = now)
    assert(res.processed.map(_.filename) == Seq("loan_a.csv"))
    // rejected carries fileId URIs, the same identifier form as every
    // other BatchResult field
    assert(res.rejected.map(_.split('/').last).toSet == Set("other_b.csv", "loan_c.txt"))
    assert(res.rejected.forall(_.startsWith("file:")))
  }

  test("exactly-once: a second run of the same batch processes nothing") {
    val (incoming, raw, out, ledger) = setup()
    put(incoming, "loan_a.csv", "loan_id\n1\n")
    put(incoming, "loan_b.csv", "loan_id\n2\n")
    val first = FileIngest.processBatch(incoming, raw, out, ledger, now = now)
    assert(first.processed.size == 2)
    val second = FileIngest.processBatch(incoming, raw, out, ledger, now = now)
    assert(second.processed.isEmpty, "already-ledgered files were reprocessed")
    // a new arrival is still picked up
    put(incoming, "loan_c.csv", "loan_id\n3\n")
    val third = FileIngest.processBatch(incoming, raw, out, ledger, now = now)
    assert(third.processed.map(_.filename) == Seq("loan_c.csv"))
  }

  test("min-age stabilization: young files are deferred, then admitted") {
    val (incoming, raw, out, ledger) = setup()
    put(incoming, "loan_young.csv", "loan_id\n1\n")
    // evaluate with `now` = actual clock: file was just created → age ~0
    val res = FileIngest.processBatch(incoming, raw, out, ledger,
      minAgeSeconds = 60, now = Instant.now())
    assert(res.processed.isEmpty)
    assert(res.deferred.size == 1)
    // same batch once 60s have (logically) passed → admitted
    val later = FileIngest.processBatch(incoming, raw, out, ledger,
      minAgeSeconds = 60, now = Instant.now().plusSeconds(120))
    assert(later.processed.map(_.filename) == Seq("loan_young.csv"))
  }

  test("gzip metrics: sizes and ratio are consistent, outputs land") {
    val (incoming, raw, out, ledger) = setup()
    val body = "loan_id,amount\n" + (1 to 500).map(i => s"$i,100.0").mkString("\n")
    put(incoming, "loan_a.csv", body)
    val res = FileIngest.processBatch(incoming, raw, out, ledger, now = now)
    val s = res.processed.head
    assert(s.originalSize == body.getBytes("UTF-8").length)
    assert(s.compressedSize > 0 && s.compressedSize < s.originalSize,
      "repetitive CSV should compress smaller")
    assert(math.abs(s.compressionRatio - s.compressedSize.toDouble / s.originalSize) < 1e-12)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(raw, "loan_a.csv")))
    val gz = java.nio.file.Paths.get(out, "loan_a.csv.gz")
    assert(java.nio.file.Files.exists(gz))
    // round-trip: gunzip returns the original bytes
    val in = new java.util.zip.GZIPInputStream(java.nio.file.Files.newInputStream(gz))
    val back = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(back == body)
  }

  test("end-to-end: ingest batch -> ETL over raw -> top-k summary -> HTML report") {
    // the reference DAG's three tasks (process_new_drive_files ->
    // run_spark_etl -> send_summary_email) as one driver program
    val (incoming, raw, out, ledger) = setup()
    put(incoming, "loan_a.csv",
      "loan_id,status,product_type,branch,amount\n" +
        "1,APPROVED,HOME,KTM,100.0\n2,APPROVED,HOME,KTM,50.5\n3,PENDING,AUTO,PKR,20.0\n")
    put(incoming, "skipme.csv", "x\n9\n")
    val batch = FileIngest.processBatch(incoming, raw, out, ledger, now = now)
    assert(batch.processed.map(_.filename) == Seq("loan_a.csv"))

    val etl = graft.etl.Pipeline.run(spark, raw, out + "/etl").get
    assert(etl.rowCount == 3)
    val summary = graft.etl.Aggregates.latestSummary(spark, etl.aggregatesPath)
    assert(summary.head("loan_count") == 2L) // APPROVED/HOME/KTM on top

    val html = graft.report.Summary.renderHtml(batch.processed, summary)
    assert(html.contains("loan_a.csv") && html.contains("APPROVED"))
    assert(html.contains("150.50")) // 100.0 + 50.5 formatted 2dp
  }

  test("scheme-qualified URIs: the whole batch runs against explicit file:// paths (S8 path story)") {
    // FileIngest goes through Hadoop FileSystem, so any supported scheme
    // (file://, hdfs://, s3a://) works; prove it with fully-qualified URIs.
    val (incoming, raw, out, ledger) = setup()
    put(incoming, "loan_a.csv", "loan_id\n1\n")
    val res = FileIngest.processBatch(
      s"file://$incoming", s"file://$raw", s"file://$out", s"file://$ledger", now = now)
    assert(res.processed.map(_.filename) == Seq("loan_a.csv"))
    assert(res.processed.head.fileId.startsWith("file:"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(raw, "loan_a.csv")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out, "loan_a.csv.gz")))
    // ledger written through the same FS API: a re-run is still a no-op
    val again = FileIngest.processBatch(
      s"file://$incoming", s"file://$raw", s"file://$out", s"file://$ledger", now = now)
    assert(again.processed.isEmpty)
  }

  test("distributed landing: a large batch lands as a Spark job, one task per file up to parallelism") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val (incoming, raw, out, ledger) = setup()
    val n = 10
    (1 to n).foreach(i =>
      put(incoming, f"loan_$i%02d.csv", "loan_id,amount\n" + s"$i,100.0\n" * 50))

    val taskCounts = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        taskCounts.add(e.stageInfo.numTasks)
    }
    spark.sparkContext.addSparkListener(listener)
    val dist =
      try FileIngest.processBatch(incoming, raw, out, ledger, now = now,
        spark = Some(spark), distributeThreshold = 2)
      finally {
        // listener events are async; give the bus a moment to drain
        val deadline = System.nanoTime() + 10_000_000_000L
        while (!taskCounts.contains(math.min(n, spark.sparkContext.defaultParallelism)) &&
          System.nanoTime() < deadline) Thread.sleep(50)
        spark.sparkContext.removeSparkListener(listener)
      }

    // the landing job actually fanned out across executor slots
    assert(taskCounts.contains(math.min(n, spark.sparkContext.defaultParallelism)),
      s"expected a landing stage with ${math.min(n, spark.sparkContext.defaultParallelism)} tasks, saw $taskCounts")
    assert(dist.processed.size == n)
    assert(dist.processed.map(_.filename) == (1 to n).map(i => f"loan_$i%02d.csv"))
    (1 to n).foreach { i =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(raw, f"loan_$i%02d.csv")))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out, f"loan_$i%02d.csv.gz")))
    }
    // exactly-once survives the distributed path: ledger was appended once
    val again = FileIngest.processBatch(incoming, raw, out, ledger, now = now,
      spark = Some(spark), distributeThreshold = 2)
    assert(again.processed.isEmpty, "distributed batch was re-ingested")

    // stats are identical to the serial path over the same files
    val root2 = tmpDir("ingest-serial")
    val serial = FileIngest.processBatch(incoming, root2.resolve("raw").toString,
      root2.resolve("out").toString, root2.resolve("ledger.json").toString, now = now)
    def key(s: FileIngest.CompressionStats) =
      (s.fileId, s.filename, s.originalSize, s.compressedSize, s.compressionRatio)
    assert(dist.processed.map(key) == serial.processed.map(key))

    // and the gzip bytes are a faithful round-trip
    val gz = java.nio.file.Paths.get(out, "loan_03.csv.gz")
    val in = new java.util.zip.GZIPInputStream(java.nio.file.Files.newInputStream(gz))
    val back = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(back == "loan_id,amount\n" + "3,100.0\n" * 50)
  }

  test("distributed landing over scheme-qualified URIs: executors resolve the broadcast conf") {
    // the S8 path story must hold on the distributed path too: executors
    // rebuild the FileSystem from the BROADCAST driver conf, so a
    // fully-qualified file:// batch lands exactly like the serial path
    val (incoming, raw, out, ledger) = setup()
    (1 to 4).foreach(i => put(incoming, s"loan_q$i.csv", s"loan_id\n$i\n"))
    val res = FileIngest.processBatch(
      s"file://$incoming", s"file://$raw", s"file://$out", s"file://$ledger",
      now = now, spark = Some(spark), distributeThreshold = 2)
    assert(res.processed.size == 4)
    assert(res.processed.forall(_.fileId.startsWith("file:")))
    (1 to 4).foreach { i =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(raw, s"loan_q$i.csv")))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out, s"loan_q$i.csv.gz")))
    }
    val again = FileIngest.processBatch(
      s"file://$incoming", s"file://$raw", s"file://$out", s"file://$ledger",
      now = now, spark = Some(spark), distributeThreshold = 2)
    assert(again.processed.isEmpty)
  }

  test("speculative attempts: concurrent landers at one destination publish a single intact artifact") {
    // spark.speculation can run two attempts of the same landing task at
    // once; the publish protocol (attempt-unique tmp + rename) must never
    // let them interleave bytes at the final path. Race real threads
    // repeatedly — any interleaving corrupts the gzip round-trip.
    val (incoming, raw, out, _) = setup()
    val body = "loan_id,amount\n" + (1 to 2000).map(i => s"$i,${i * 3.5}").mkString("\n")
    put(incoming, "loan_race.csv", body)
    val id = s"file://$incoming/loan_race.csv"
    val conf = new org.apache.hadoop.conf.Configuration()
    val attempts = 4
    (1 to 10).foreach { round =>
      val barrier = new java.util.concurrent.CyclicBarrier(attempts)
      val results = new java.util.concurrent.ConcurrentLinkedQueue[FileIngest.CompressionStats]()
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to attempts).map { a =>
        new Thread(() => {
          try {
            barrier.await()
            results.add(FileIngest.landOne(id, body.length.toLong, raw, out, conf,
              attemptTag = s"r$round-a$a"))
          } catch { case t: Throwable => errors.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errors.isEmpty, s"round $round: ${errors.peek()}")
      // every attempt reports the same published artifact
      assert(results.size == attempts)
      assert(results.stream().map(_.compressedSize).distinct().count() == 1)
      // the raw copy is byte-identical to the source
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(raw, "loan_race.csv")) == body)
      // the gz is one complete stream, not an interleaving
      val in = new java.util.zip.GZIPInputStream(
        java.nio.file.Files.newInputStream(java.nio.file.Paths.get(out, "loan_race.csv.gz")))
      val back = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      assert(back == body, s"round $round: corrupt gzip publish")
    }
    // no attempt left its tmp behind in either destination dir
    def tmps(dir: String) = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(_.getFileName.toString.contains(".inprogress-")).count()
    assert(tmps(raw) == 0 && tmps(out) == 0, "orphaned .inprogress tmp files")
  }

  test("losing attempt adopts the winner's published artifact unchanged") {
    val (incoming, raw, out, _) = setup()
    val body = "loan_id\n" + (1 to 100).mkString("\n")
    put(incoming, "loan_w.csv", body)
    val id = s"file://$incoming/loan_w.csv"
    val conf = new org.apache.hadoop.conf.Configuration()
    val winner = FileIngest.landOne(id, body.length.toLong, raw, out, conf, attemptTag = "w")
    val gzBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out, "loan_w.csv.gz"))
    // a straggler attempt arrives after the publish: same stats, bytes untouched
    val loser = FileIngest.landOne(id, body.length.toLong, raw, out, conf, attemptTag = "l")
    assert(loser == winner)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out, "loan_w.csv.gz")), gzBytes))
  }

  test("distribution guard: file:-backed dirs only distribute on a local-mode cluster") {
    val conf = new org.apache.hadoop.conf.Configuration()
    // scheme-less and file: paths name machine-local disks
    assert(!FileIngest.executorVisible("/data/incoming", conf))
    assert(!FileIngest.executorVisible("file:///data/incoming", conf))
    // shared stores are executor-visible at the same URIs
    assert(FileIngest.executorVisible("hdfs://nn:8020/data/incoming", conf))
    assert(FileIngest.executorVisible("s3a://bucket/incoming", conf))
    // a scheme-less path against a cluster default FS inherits that scheme
    val clusterConf = new org.apache.hadoop.conf.Configuration()
    clusterConf.set("fs.defaultFS", "hdfs://nn:8020")
    assert(FileIngest.executorVisible("/data/incoming", clusterConf))
  }

  test("ledger round-trips through the reference JSON format") {
    val (_, _, _, ledger) = setup()
    FileLedger.save(ledger, Set("b", "a"), now = Instant.parse("2026-08-12T00:00:00Z"))
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(ledger))
    assert(text.contains("\"processed_file_ids\""))
    assert(text.contains("\"last_updated\""))
    assert(FileLedger.load(ledger) == Set("a", "b"))
    // corrupt ledger loads as empty (defensive read, like the reference)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(ledger), "{not json")
    assert(FileLedger.load(ledger) == Set.empty[String])
  }
}
