package graft

import java.time.Instant

/** Golden end-to-end run of the composed DAG — the reference's
  * `poll_and_process >> run_spark >> send_email_summary` chain
  * (drive_auto_compress_email.py:577-602) demonstrated as one call:
  * fixture CSVs in, landed + gzipped files, cleaned + aggregates parquet,
  * and the HTML report out; a second run no-ops at ingest via the ledger
  * and therefore emits no report.
  */
class DagSpec extends SparkSpec {

  private val header =
    "loan_id,customer_id,created_at,amount,interest_rate,tenure_months,status,product_type,branch,credit_score_band"

  test("end-to-end: ingest -> etl -> report; second run no-ops via ledger") {
    val incoming = tmpDir("dag_incoming"); val work = tmpDir("dag_work")
    writeFile(incoming, "loan_batch1.csv",
      s"""$header
         |L1,C1,2024-01-15 10:30:00,1000.5,12.5,12,APPROVED,PERSONAL,KTM,A
         |L2,C2,2024-01-16 11:00:00,2000.0,11.0,24,APPROVED,HOME,PKR,B
         |L3,C3,2024-01-17 12:00:00,1500.25,10.0,36,PENDING,PERSONAL,KTM,A
         |""".stripMargin)
    writeFile(incoming, "loan_batch2.csv",
      s"""$header
         |L4,C4,2024-02-01 09:00:00,500.0,9.5,6,APPROVED,PERSONAL,KTM,A
         |""".stripMargin)
    // admission filter: wrong prefix is rejected, like the reference's
    // name check (drive_auto_compress_email.py:203-204)
    writeFile(incoming, "notes.csv", "not,a,loan,file\n")

    // an ingest clock BEFORE the fixtures' mtimes: everything is younger
    // than min-age, so ingest defers all files and the ETL stage has
    // nothing landed — the composed run must no-op cleanly, not throw
    val run0 = Dag.run(spark, incoming.toString, work.toString,
      minAgeSeconds = 60L, now = Instant.parse("2020-01-01T00:00:00Z"))
    assert(run0.batch.processed.isEmpty && run0.batch.deferred.size === 2)
    assert(run0.etl.isEmpty && run0.reportPath.isEmpty)

    // minAgeSeconds = 0: fixture files were written just now
    val run1 = Dag.run(spark, incoming.toString, work.toString,
      minAgeSeconds = 0L)

    // stage 1: ingest — both loan files processed, the stray rejected
    assert(run1.batch.processed.map(_.filename).sorted ===
      Seq("loan_batch1.csv", "loan_batch2.csv"))
    assert(run1.batch.rejected.map(_.split('/').last) === Seq("notes.csv"))
    assert(run1.batch.deferred.isEmpty)
    run1.batch.processed.foreach { s =>
      assert(new java.io.File(s.rawPath.stripPrefix("file:")).exists(), s.rawPath)
      assert(new java.io.File(s.compressedPath.stripPrefix("file:")).exists(), s.compressedPath)
      assert(s.originalSize > 0 && s.compressedSize > 0)
    }

    // stage 2: ETL over everything landed
    val etl = run1.etl.get
    assert(etl.rowCount === 4L)
    assert(spark.read.parquet(etl.cleanedPath).count() === 4L)
    val agg = spark.read.parquet(etl.aggregatesPath)
      .orderBy("status", "product_type", "branch").collect()
    // ordered by the group keys: (APPROVED, HOME) then (APPROVED, PERSONAL)
    assert(agg.map(r => (r.getAs[String]("status"), r.getAs[String]("product_type"),
      r.getAs[Long]("loan_count"))).toSeq ===
      Seq(("APPROVED", "HOME", 1L), ("APPROVED", "PERSONAL", 2L), ("PENDING", "PERSONAL", 1L)))

    // stage 3: report renders this batch's files and the aggregates
    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(work.resolve("report.html").toString))
    assert(run1.reportPath.isDefined)
    // the reference's subject line (drive_auto_compress_email.py:365)
    assert(run1.reportSubject === Some("[Loan ETL] 2 file(s) processed – loan-etl"))
    assert(html.contains("loan_batch1.csv") && html.contains("loan_batch2.csv"))
    assert(html.contains("Loan Aggregates") && html.contains("PERSONAL"))
    assert(html.contains("Processed <b>2</b> file(s)"))

    // second run: ledger makes ingest exactly-once -> nothing processed,
    // no report (the reference skips the email on an empty XCom,
    // drive_auto_compress_email.py:547-549); the ETL full recompute
    // still reproduces identical outputs
    val run2 = Dag.run(spark, incoming.toString, work.toString,
      minAgeSeconds = 0L)
    assert(run2.batch.processed.isEmpty)
    assert(run2.reportPath.isEmpty)
    assert(run2.etl.get.rowCount === 4L)

    // a file that arrives too recently is deferred, then picked up once
    // stable (MIN_FILE_AGE_SECONDS, drive_auto_compress_email.py:227-238)
    val f3 = writeFile(incoming, "loan_batch3.csv",
      s"""$header
         |L5,C5,2024-03-01 08:00:00,750.0,8.0,12,PENDING,HOME,PKR,C
         |""".stripMargin)
    val mtime = java.nio.file.Files.getLastModifiedTime(f3).toInstant
    val run3 = Dag.run(spark, incoming.toString, work.toString,
      minAgeSeconds = 3600L, now = mtime.plusSeconds(10))
    assert(run3.batch.deferred.size === 1 && run3.batch.processed.isEmpty)
    assert(run3.reportPath.isEmpty)
    val run4 = Dag.run(spark, incoming.toString, work.toString,
      minAgeSeconds = 3600L, now = mtime.plusSeconds(7200))
    assert(run4.batch.processed.map(_.filename) === Seq("loan_batch3.csv"))
    assert(run4.etl.get.rowCount === 5L)
    val html4 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(work.resolve("report.html").toString))
    assert(html4.contains("loan_batch3.csv") && !html4.contains("loan_batch1.csv"))
  }

  test("loop mode: a file arriving between iterations is ingested by exactly the next one") {
    val incoming = tmpDir("dagloop_in"); val work = tmpDir("dagloop_work")
    writeFile(incoming, "loan_first.csv",
      s"""$header
         |L1,C1,2024-01-15 10:30:00,1000.5,12.5,12,APPROVED,PERSONAL,KTM,A
         |""".stripMargin)
    val results = scala.collection.mutable.Buffer.empty[Dag.RunResult]
    var slept = Seq.empty[Long]
    // a FIXED injected clock (ahead of the fixtures' real mtimes, so
    // minAge 0 admits them): zero elapsed time on the fixed-rate grid
    // means each wait is exactly the full interval — deterministic
    val fixedNow = Instant.now().plusSeconds(30)
    Dag.runLoop(spark, incoming.toString, work.toString,
      intervalSeconds = 60L,
      minAgeSeconds = 0L,
      iterations = 2L,
      // the sleep seam doubles as the between-iterations arrival: the
      // second file lands while the loop waits out its interval
      sleep = { ms =>
        slept :+= ms
        writeFile(incoming, "loan_second.csv",
          s"""$header
             |L2,C2,2024-01-16 11:00:00,2000.0,11.0,24,APPROVED,HOME,PKR,B
             |""".stripMargin)
        ()
      },
      clock = () => fixedNow,
      onRun = results += _)

    assert(slept === Seq(60000L), "two iterations sleep exactly once, for the full interval")
    assert(results.size === 2)
    assert(results(0).batch.processed.map(_.filename) === Seq("loan_first.csv"))
    // the second iteration ingests exactly the new arrival — the first
    // file is in the shared ledger, so single-run semantics hold per tick
    assert(results(1).batch.processed.map(_.filename) === Seq("loan_second.csv"))
    assert(results(1).etl.get.rowCount === 2L,
      "the ETL full recompute sees everything landed so far")
    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(work.resolve("report.html").toString))
    assert(html.contains("loan_second.csv") && !html.contains("loan_first.csv"),
      "the tick's report covers only its own batch")
  }

  test("loop mode: a failed tick is isolated — the loop continues and the next tick is exact") {
    // the scheduler this mirrors fails one DAG run and still fires the
    // next; every tick is independently idempotent, so a transient
    // failure must not kill the long-running loop
    val incoming = tmpDir("dagfail_in"); val work = tmpDir("dagfail_work")
    writeFile(incoming, "loan_first.csv",
      s"""$header
         |L1,C1,2024-01-15 10:30:00,1000.5,12.5,12,APPROVED,PERSONAL,KTM,A
         |""".stripMargin)
    val results = scala.collection.mutable.Buffer.empty[Dag.RunResult]
    var calls = 0
    Dag.runLoop(spark, incoming.toString, work.toString,
      intervalSeconds = 60L, minAgeSeconds = 0L, iterations = 2L,
      sleep = { _ =>
        writeFile(incoming, "loan_second.csv",
          s"""$header
             |L2,C2,2024-01-16 11:00:00,2000.0,11.0,24,APPROVED,HOME,PKR,B
             |""".stripMargin)
        ()
      },
      onRun = { r =>
        calls += 1
        if (calls == 1) throw new RuntimeException("injected tick failure")
        results += r
      })
    assert(calls === 2, "the loop must survive a failed tick and run the next")
    // tick 1's ingest completed before the injected failure, so its file
    // is ledgered; tick 2 processes exactly the between-ticks arrival
    assert(results.map(_.batch.processed.map(_.filename)) === Seq(Seq("loan_second.csv")))
  }

  test("loop mode: fixed-rate grid — a slow run skips overrun slots and fires on the grid") {
    // the reference cron fires every minute wall-clock regardless of run
    // duration (drive_auto_compress_email.py:582): a 130 s run on a 60 s
    // interval must NOT sleep another 60 s (fixed-delay drift) nor fire
    // twice back-to-back to catch up — it skips the two overrun slots
    // and fires on the 180 s grid point
    val incoming = tmpDir("daggrid_in"); val work = tmpDir("daggrid_work")
    writeFile(incoming, "loan_first.csv",
      s"""$header
         |L1,C1,2024-01-15 10:30:00,1000.5,12.5,12,APPROVED,PERSONAL,KTM,A
         |""".stripMargin)
    val t0 = Instant.now().plusSeconds(60) // ahead of fixture mtimes: minAge 0 admits
    // scripted clock, one entry per read: loop epoch, tick-1 `now`,
    // post-tick-1 scheduling read (the tick "took" 130 s), tick-2 `now`
    val times = scala.collection.mutable.Queue(
      t0, t0.plusSeconds(1), t0.plusSeconds(130), t0.plusSeconds(181))
    var last = t0
    val slept = scala.collection.mutable.Buffer.empty[Long]
    Dag.runLoop(spark, incoming.toString, work.toString,
      intervalSeconds = 60L, minAgeSeconds = 0L, iterations = 2L,
      sleep = { ms => slept += ms; () },
      clock = () => { if (times.nonEmpty) last = times.dequeue(); last })
    assert(slept.toSeq === Seq(50000L),
      "finished at +130s: the 60s and 120s slots are skipped; next fire is the 180s grid point, 50s away")
  }

  test("loop mode: stop requested mid-tick finishes the tick, delivers it, and exits without sleeping") {
    val incoming = tmpDir("dagstop_in"); val work = tmpDir("dagstop_work")
    writeFile(incoming, "loan_first.csv",
      s"""$header
         |L1,C1,2024-01-15 10:30:00,1000.5,12.5,12,APPROVED,PERSONAL,KTM,A
         |""".stripMargin)
    val control = new Dag.LoopControl
    var delivered = Seq.empty[Dag.RunResult]
    // iterations = 0 would loop forever: only the stop request ends it
    Dag.runLoop(spark, incoming.toString, work.toString,
      intervalSeconds = 60L, minAgeSeconds = 0L, iterations = 0L,
      sleep = _ => fail("the loop must exit after the stopped tick, not wait for another"),
      onRun = { r => delivered :+= r; control.requestStop() },
      control = control)
    assert(delivered.size === 1, "the in-flight tick completes and delivers exactly once")
    assert(delivered.head.batch.processed.map(_.filename) === Seq("loan_first.csv"))
  }

  test("loop mode: stop during the between-ticks wait exits before the next tick") {
    val incoming = tmpDir("dagstop2_in"); val work = tmpDir("dagstop2_work")
    writeFile(incoming, "loan_first.csv",
      s"""$header
         |L1,C1,2024-01-15 10:30:00,1000.5,12.5,12,APPROVED,PERSONAL,KTM,A
         |""".stripMargin)
    val control = new Dag.LoopControl
    var ticks = 0
    Dag.runLoop(spark, incoming.toString, work.toString,
      intervalSeconds = 60L, minAgeSeconds = 0L, iterations = 0L,
      sleep = _ => control.requestStop(), // SIGTERM arrives mid-wait
      onRun = _ => ticks += 1,
      control = control)
    assert(ticks === 1, "no further tick may start once stop is requested during the wait")
  }

  test("LoopControl.await wakes promptly on requestStop from another thread") {
    // the default (seam-less) sleep path must not hold shutdown hostage
    // for the rest of a long interval
    val c = new Dag.LoopControl
    val t = new Thread(() => { Thread.sleep(100); c.requestStop() })
    t.start()
    val start = System.nanoTime()
    c.await(60000L)
    val waitedMs = (System.nanoTime() - start) / 1000000L
    t.join()
    assert(c.stopRequested)
    assert(waitedMs < 30000L, s"await must wake on requestStop, waited ${waitedMs}ms")
  }

  test("post-commit failure: files stay ledgered, PostCommitFailure names them, data still surfaces") {
    val incoming = tmpDir("dagpc_in"); val work = tmpDir("dagpc_work")
    writeFile(incoming, "loan_a.csv",
      s"""$header
         |L1,C1,2024-01-15 10:30:00,1000.5,12.5,12,APPROVED,PERSONAL,KTM,A
         |""".stripMargin)
    // sabotage the REPORT phase — after the ledger append and the ETL:
    // report.html pre-created as a non-empty directory makes fs.create throw
    val rpt = java.nio.file.Paths.get(work.resolve("report.html").toString)
    java.nio.file.Files.createDirectories(rpt)
    java.nio.file.Files.writeString(rpt.resolve("occupied"), "x")
    val e = intercept[Dag.PostCommitFailure](
      Dag.run(spark, incoming.toString, work.toString, minAgeSeconds = 0L))
    assert(e.batch.processed.map(_.filename) === Seq("loan_a.csv"),
      "the failure must carry exactly the batch that was ledgered")
    assert(e.getCause != null, "the underlying report-phase error is preserved")

    // the ledger committed BEFORE the failure: the next run must not
    // re-ingest (no retry exists for a post-commit failure) — but the
    // landed data still surfaces via the full recompute
    java.nio.file.Files.delete(rpt.resolve("occupied"))
    java.nio.file.Files.delete(rpt)
    val again = Dag.run(spark, incoming.toString, work.toString, minAgeSeconds = 0L)
    assert(again.batch.processed.isEmpty, "post-commit failure must not re-ingest its files")
    assert(again.etl.get.rowCount === 1L, "the landed data surfaces via the next full recompute")
    assert(again.reportPath.isEmpty, "no new files -> the lost batch report is NOT re-rendered")
  }

  test("loop mode: a post-commit tick failure is isolated and the loop continues") {
    val incoming = tmpDir("dagpcl_in"); val work = tmpDir("dagpcl_work")
    writeFile(incoming, "loan_a.csv",
      s"""$header
         |L1,C1,2024-01-15 10:30:00,1000.5,12.5,12,APPROVED,PERSONAL,KTM,A
         |""".stripMargin)
    val rpt = java.nio.file.Paths.get(work.resolve("report.html").toString)
    java.nio.file.Files.createDirectories(rpt)
    java.nio.file.Files.writeString(rpt.resolve("occupied"), "x")
    val results = scala.collection.mutable.Buffer.empty[Dag.RunResult]
    Dag.runLoop(spark, incoming.toString, work.toString,
      intervalSeconds = 60L, minAgeSeconds = 0L, iterations = 2L,
      // clear the sabotage between ticks — tick 2 must run clean
      sleep = { _ =>
        java.nio.file.Files.delete(rpt.resolve("occupied"))
        java.nio.file.Files.delete(rpt)
        ()
      },
      onRun = results += _)
    // tick 1 failed post-commit (not delivered); tick 2 has nothing new
    // to ingest — loan_a is ledgered — and delivers an empty-batch result
    assert(results.size === 1)
    assert(results.head.batch.processed.isEmpty,
      "the post-commit tick's files are ledgered; the next tick must not retry them")
    assert(results.head.etl.get.rowCount === 1L)
  }

  test("retention through the composed DAG: over-age files refused, fresh ones processed") {
    val incoming = tmpDir("dagret_in"); val work = tmpDir("dagret_work")
    val base = System.currentTimeMillis()
    val r = 10000L
    writeFile(incoming, "loan_old.csv",
      s"""$header
         |L1,C1,2024-01-15 10:30:00,1000.5,12.5,12,APPROVED,PERSONAL,KTM,A
         |""".stripMargin).toFile.setLastModified(base - 3 * r)
    writeFile(incoming, "loan_new.csv",
      s"""$header
         |L2,C2,2024-01-16 11:00:00,2000.0,11.0,24,APPROVED,HOME,PKR,B
         |""".stripMargin).toFile.setLastModified(base)
    val run = Dag.run(spark, incoming.toString, work.toString,
      minAgeSeconds = 0L, maxFileAgeMs = r, now = Instant.ofEpochMilli(base + 1000))
    assert(run.batch.processed.map(_.filename) === Seq("loan_new.csv"))
    assert(run.batch.expired.size === 1 && run.batch.expired.head.endsWith("loan_old.csv"))
    assert(run.etl.get.rowCount === 1L)
    // the refused file never reaches the landing zone or the report
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(work.resolve("raw").toString, "loan_old.csv")))
    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(work.resolve("report.html").toString))
    assert(html.contains("loan_new.csv") && !html.contains("loan_old.csv"))
  }

  test("store vacuum scheduling: the tick sweeps superseded dirs; serving snapshot unchanged; failures isolated") {
    import spark.implicits._
    import graft.ops.StoreManifest
    import graft.ops.StoreManifest.Snapshot
    val incoming = tmpDir("dagvac_in"); val work = tmpDir("dagvac_work")
    writeFile(incoming, "loan_v.csv",
      """loan_id,customer_id,application_date,loan_amount,interest_rate,term_months,status,loan_type,currency,branch
        |L1,C1,2024-01-15 10:30:00,1000.0,12.5,12,APPROVED,AUTO,PKR,A
        |""".stripMargin)
    // two stores with history + an orphan from a "crashed" mutation
    val storeA = tmpDir("dagvac_storeA").toString
    val storeB = tmpDir("dagvac_storeB").toString
    Seq(1L).toDF("id").write.parquet(s"$storeA/d-v000000001")
    Seq(2L).toDF("id").write.parquet(s"$storeA/d-v000000002")
    Seq(3L).toDF("id").write.parquet(s"$storeA/d-v000000003")
    Seq(9L).toDF("id").write.parquet(s"$storeA/orphan-v000000009")
    StoreManifest.publish(spark, storeA, Snapshot(1L, -1L, Map("d" -> Seq("d-v000000001"))))
    StoreManifest.publish(spark, storeA, Snapshot(2L, -1L, Map("d" -> Seq("d-v000000002"))))
    StoreManifest.publish(spark, storeA, Snapshot(3L, -1L, Map("d" -> Seq("d-v000000003"))))
    Seq(7L).toDF("id").write.parquet(s"$storeB/p-v000000001")
    StoreManifest.publish(spark, storeB, Snapshot(1L, -1L, Map("p" -> Seq("p-v000000001"))))

    val before = StoreManifest.currentSnapshot(spark, storeA).get
    // a nonexistent third store must not fail the tick (failure isolation)
    val run = Dag.run(spark, incoming.toString, work.toString,
      minAgeSeconds = 0L,
      storeDirs = Seq(storeA, storeB, "/nonexistent/not-a-store"),
      storeKeepVersions = 1)
    assert(run.batch.processed.map(_.filename) === Seq("loan_v.csv"))

    // superseded + orphan dirs swept; ONLY the current snapshot's remain
    val namesA = new java.io.File(storeA).listFiles().map(_.getName).toSet
    assert(namesA === Set("_manifest", "d-v000000003"), namesA.toString)
    // serving snapshot identical pre/post sweep, and still reads
    val after = StoreManifest.currentSnapshot(spark, storeA).get
    assert(after === before)
    assert(StoreManifest.readComponent(spark, storeA, after, "d").get
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
    // a store already at retention is untouched
    assert(new java.io.File(storeB).listFiles().map(_.getName).toSet ===
      Set("_manifest", "p-v000000001"))
    // the sweep also composes on the loop path
    Dag.runLoop(spark, incoming.toString, work.toString,
      intervalSeconds = 1L, minAgeSeconds = 0L, iterations = 1L,
      sleep = _ => (), storeDirs = Seq(storeA), storeKeepVersions = 1)
    assert(StoreManifest.currentSnapshot(spark, storeA).get === before)
  }
}
