package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Bounded admission state: `maxFileAgeMs` retention on the
  * StableCsvSource admission log. The invariant PAIR under test:
  * compaction evicts entries whose recorded mtime aged past retention,
  * AND the listing refuses files that old — so eviction can never cause
  * re-admission (the same contract as Spark's file-source `maxFileAge`).
  * Age is relative to the newest STABILIZED file mtime ever seen, never
  * the wall clock: a backlog older than the window in wall terms is
  * still ingested when nothing newer exists (outage safety), and a
  * driver clock step-back cannot re-admit an evicted file. Plus the
  * compaction cadence: ordinary commits are no-ops until
  * `compactInterval` committed chunks accumulate.
  *
  * These tests drive the MicroBatchStream directly with an injected
  * clock (the `nowMs` seam) — deterministic, no sleeps, no wall-clock
  * flake — and one streaming-level drain proves the over-age refusal
  * end-to-end.
  */
class StableCsvRetentionSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("loan_id", LongType),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  private def props(in: java.nio.file.Path, extra: (String, String)*): Map[String, String] =
    Map("path" -> in.toString, "minAgeMs" -> "0", "pathGlobFilter" -> "*.csv",
      "compactInterval" -> "1") ++ extra

  private class Clocked(p: Map[String, String], ckpt: String, @volatile var now: Long)
      extends StableCsvMicroBatchStream(schema, p, ckpt) {
    override protected def nowMs: Long = now
  }

  private def logFiles(ckpt: java.nio.file.Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val d = ckpt.resolve("graft-admitted")
    if (!java.nio.file.Files.isDirectory(d)) Seq.empty
    else java.nio.file.Files.list(d).iterator().asScala.map(_.getFileName.toString).toSeq
  }

  private def logText(ckpt: java.nio.file.Path, name: String): String =
    java.nio.file.Files.readString(ckpt.resolve("graft-admitted").resolve(name))

  test("compaction evicts aged entries; eviction never re-admits; restart stays exactly-once") {
    spark // force an active session for SparkSession.active in the stream ctor
    val in = tmpDir("ret-in"); val ckpt = tmpDir("ret-ckpt")
    val base = System.currentTimeMillis()
    val retention = 10000L
    val p = props(in, "maxFileAgeMs" -> retention.toString)

    val a = writeFile(in, "a.csv", "loan_id,name,amount\n1,a,1.0\n")
    a.toFile.setLastModified(base)
    val s1 = new Clocked(p, ckpt.toString, base + 1000)
    s1.initialOffset()
    assert(s1.latestOffset().asInstanceOf[ChunkOffset].chunks == 1L, "file a should be admitted")
    val p1 = s1.planInputPartitions(ChunkOffset(0), ChunkOffset(1))
    assert(p1.length == 1 && p1.head.asInstanceOf[CsvFilePartition].path.endsWith("a.csv"))

    // the clock advances past retention; a fresh file lands
    s1.now = base + 2 * retention
    val c = writeFile(in, "c.csv", "loan_id,name,amount\n2,c,2.0\n")
    c.toFile.setLastModified(base + 2 * retention - 1000)
    assert(s1.latestOffset().asInstanceOf[ChunkOffset].chunks == 2L, "file c should be admitted")

    // batch 0 commits -> compaction folds chunk 0; a's entry has aged out
    s1.commit(ChunkOffset(1))
    val snaps = logFiles(ckpt).filter(_.startsWith("snapshot-"))
    assert(snaps == Seq("snapshot-1"), s"expected one snapshot, got ${logFiles(ckpt)}")
    assert(!logText(ckpt, "snapshot-1").contains("a.csv"),
      "aged entry must leave the snapshot at compaction")

    // same instance: a was evicted from the in-memory admitted set, but the
    // listing refuses over-age files — so no re-admission
    assert(s1.latestOffset().asInstanceOf[ChunkOffset].chunks == 2L,
      "evicted file must not be re-admitted")

    // restart: a fresh instance rebuilds from the (evicted) log; still exactly-once
    val s2 = new Clocked(p, ckpt.toString, base + 2 * retention + 1000)
    s2.initialOffset()
    assert(s2.latestOffset().asInstanceOf[ChunkOffset].chunks == 2L,
      "restart after eviction re-admitted a file")
    val p2 = s2.planInputPartitions(ChunkOffset(1), ChunkOffset(2))
    assert(p2.length == 1 && p2.head.asInstanceOf[CsvFilePartition].path.endsWith("c.csv"))
  }

  test("retention ages against the newest file seen, not the wall clock") {
    spark
    val in = tmpDir("ret3-in"); val ckpt = tmpDir("ret3-ckpt")
    val base = System.currentTimeMillis()
    val retention = 10000L
    val p = props(in, "maxFileAgeMs" -> retention.toString)

    // an outage-shaped start: the only file is far older than retention
    // in WALL terms, but nothing newer has ever been seen — it must be
    // ingested, not silently dropped (Spark maxFileAge contract)
    val old = writeFile(in, "backlog.csv", "loan_id,name,amount\n1,b,1.0\n")
    old.toFile.setLastModified(base - 100 * retention)
    val s = new Clocked(p, ckpt.toString, base)
    s.initialOffset()
    assert(s.latestOffset().asInstanceOf[ChunkOffset].chunks == 1L,
      "a lone backlog file must be admitted regardless of wall-clock age")

    // a much newer file arrives: the reference advances, and a file
    // between the two ages (older than newest-retention) is now refused
    val mid = writeFile(in, "mid.csv", "loan_id,name,amount\n2,m,2.0\n")
    mid.toFile.setLastModified(base - 2 * retention)
    val fresh = writeFile(in, "fresh.csv", "loan_id,name,amount\n3,f,3.0\n")
    fresh.toFile.setLastModified(base)
    assert(s.latestOffset().asInstanceOf[ChunkOffset].chunks == 2L)
    val part = s.planInputPartitions(ChunkOffset(1), ChunkOffset(2))
    assert(part.map(_.asInstanceOf[CsvFilePartition].path).forall(_.endsWith("fresh.csv")),
      "a file older than newest-minus-retention must be refused")
  }

  test("a clock step-back after eviction cannot re-admit (monotonic reference)") {
    spark
    val in = tmpDir("ret4-in"); val ckpt = tmpDir("ret4-ckpt")
    val base = System.currentTimeMillis()
    val retention = 10000L
    val s = new Clocked(props(in, "maxFileAgeMs" -> retention.toString),
      ckpt.toString, base + 1000)
    s.initialOffset()
    val a = writeFile(in, "a.csv", "loan_id,name,amount\n1,a,1.0\n")
    a.toFile.setLastModified(base)
    assert(s.latestOffset().asInstanceOf[ChunkOffset].chunks == 1L)
    val b = writeFile(in, "b.csv", "loan_id,name,amount\n2,b,2.0\n")
    b.toFile.setLastModified(base + 2 * retention)
    s.now = base + 2 * retention + 1000
    assert(s.latestOffset().asInstanceOf[ChunkOffset].chunks == 2L)
    s.commit(ChunkOffset(2)) // compacts (interval 1); a's entry evicted
    assert(!logText(ckpt, "snapshot-2").contains("a.csv"), "a must be evicted")
    // the driver clock steps back to just after a's mtime: a is still
    // stabilized (now >= mtime) and under WALL-CLOCK aging its age would
    // be 1 s — well inside retention, so the old semantics would
    // re-admit the evicted file. The monotonic latest-seen reference
    // (b's mtime, 2× retention newer) must keep refusing it.
    s.now = base + 1000
    assert(s.latestOffset().asInstanceOf[ChunkOffset].chunks == 2L,
      "clock step-back re-admitted an evicted file")
  }

  test("compaction persists the retention reference; restart cannot regress it (marker entry)") {
    spark
    val in = tmpDir("ret5-in"); val ckpt = tmpDir("ret5-ckpt")
    val base = System.currentTimeMillis()
    val r = 10000L
    val p = props(in, "maxFileAgeMs" -> r.toString, "maxFilesPerTrigger" -> "1")

    val s = new Clocked(p, ckpt.toString, base + r + 5000)
    s.initialOffset()
    val a = writeFile(in, "a.csv", "loan_id,name,amount\n1,a,1.0\n")
    a.toFile.setLastModified(base + r + 4000)
    assert(s.latestOffset().asInstanceOf[ChunkOffset].chunks == 1L)

    // one poll sees TWO new files under a 1-file trigger cap: the older
    // is admitted, the newest only advances the retention reference —
    // the exact state where the reference exceeds every ADMITTED mtime
    val f1 = writeFile(in, "f1.csv", "loan_id,name,amount\n2,b,2.0\n")
    f1.toFile.setLastModified(base + 2 * r)
    val f2 = writeFile(in, "f2.csv", "loan_id,name,amount\n3,c,3.0\n")
    f2.toFile.setLastModified(base + 2 * r + 5000)
    s.now = base + 2 * r + 6000
    assert(s.latestOffset().asInstanceOf[ChunkOffset].chunks == 2L)
    assert(s.planInputPartitions(ChunkOffset(1), ChunkOffset(2))
      .head.asInstanceOf[CsvFilePartition].path.endsWith("f1.csv"),
      "oldest-first admission under the trigger cap")

    // compaction: a's entry is older than reference-minus-retention ->
    // evicted; the reference itself is written as the marker line
    s.commit(ChunkOffset(2))
    val snap = logText(ckpt, "snapshot-2")
    assert(snap.linesIterator.contains(s"#ref\t${base + 2 * r + 5000}"),
      s"snapshot must persist the reference as a dedicated #ref marker line:\n$snap")
    assert(!snap.contains("a.csv"))

    // the never-admitted newest file vanishes; without the marker a
    // restart would rebuild the reference from f1's mtime — low enough
    // that evicted a.csv passes retention again and re-ingests
    java.nio.file.Files.delete(f2)
    val s2 = new Clocked(p, ckpt.toString, base + 2 * r + 7000)
    s2.initialOffset()
    assert(s2.latestOffset().asInstanceOf[ChunkOffset].chunks == 2L,
      "restart regressed the retention reference and re-admitted an evicted file")
  }

  test("a file older than maxFileAge is never admitted (streaming end-to-end)") {
    val in = tmpDir("ret2-in"); val out = tmpDir("ret2-out"); val ckpt = tmpDir("ret2-ckpt")
    val now = System.currentTimeMillis()
    val fresh = writeFile(in, "loan_fresh.csv", "loan_id,name,amount\n1,f,1.0\n")
    fresh.toFile.setLastModified(now - 60000) // 1 min old: stable, within retention
    val stale = writeFile(in, "loan_stale.csv", "loan_id,name,amount\n2,s,2.0\n")
    stale.toFile.setLastModified(now - 2 * 3600000L) // 2 h old: beyond retention

    def drain(): Unit = {
      val df = StreamingEtl.stableCsvStream(
        spark, in.toString, schema, java.time.Duration.ofSeconds(1),
        maxFileAge = Some(java.time.Duration.ofHours(1)))
      val q = df.writeStream
        .format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain(); drain()
    val rows = spark.read.schema(schema).parquet(out.toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "f")), s"over-age file must never be admitted: $rows")
  }

  test("ordinary commits are no-ops until compactInterval chunks accumulate") {
    spark
    val in = tmpDir("ci-in"); val ckpt = tmpDir("ci-ckpt")
    val old = System.currentTimeMillis() - 60000
    val s = new Clocked(props(in, "compactInterval" -> "3"), ckpt.toString,
      System.currentTimeMillis())
    s.initialOffset()
    (1 to 2).foreach { i =>
      writeFile(in, s"f$i.csv", s"loan_id,name,amount\n$i,x,1.0\n").toFile.setLastModified(old)
      assert(s.latestOffset().asInstanceOf[ChunkOffset].chunks == i.toLong)
      s.commit(ChunkOffset(i.toLong))
      // below the interval: commit must be a cheap no-op (no snapshot yet)
      assert(!logFiles(ckpt).exists(_.startsWith("snapshot-")),
        s"commit $i compacted below the interval: ${logFiles(ckpt)}")
    }
    writeFile(in, "f3.csv", "loan_id,name,amount\n3,x,1.0\n").toFile.setLastModified(old)
    assert(s.latestOffset().asInstanceOf[ChunkOffset].chunks == 3L)
    s.commit(ChunkOffset(3))
    val names = logFiles(ckpt)
    assert(names.count(_.startsWith("snapshot-")) == 1,
      s"3 dead chunks must trigger compaction: $names")
    assert(!names.exists(n => n.nonEmpty && n.forall(_.isDigit)),
      s"compacted chunks must be deleted: $names")
  }

  test("retention eviction survives a compaction crash: resurrected entries re-evict, never re-ingest") {
    spark
    val in = tmpDir("retcrash-in"); val ckpt = tmpDir("retcrash-ckpt")
    val base = System.currentTimeMillis()
    val r = 10000L
    val p = props(in, "maxFileAgeMs" -> r.toString, "compactInterval" -> "2")

    class CrashingClocked(n: Long) extends Clocked(p, ckpt.toString, n) {
      @volatile var armed = false
      override protected def afterSnapshotPublish(): Unit =
        if (armed) throw new RuntimeException("injected crash after snapshot publish")
    }

    val s1 = new CrashingClocked(base + 1000)
    s1.initialOffset()
    writeFile(in, "old.csv", "loan_id,name,amount\n1,a,1.0\n")
      .toFile.setLastModified(base)
    assert(s1.latestOffset().asInstanceOf[ChunkOffset].chunks == 1L)
    s1.commit(ChunkOffset(1)) // below the interval: chunk 0 stays live
    writeFile(in, "new.csv", "loan_id,name,amount\n2,b,2.0\n")
      .toFile.setLastModified(base + 2 * r)
    s1.now = base + 2 * r + 1000
    assert(s1.latestOffset().asInstanceOf[ChunkOffset].chunks == 2L)
    s1.armed = true
    intercept[RuntimeException](s1.commit(ChunkOffset(2)))

    // crash state: snapshot-2 published with old.csv evicted (marker +
    // new.csv only), but the dead chunks — chunk 0 still holding old.csv
    // — were never deleted
    val snap2 = logText(ckpt, "snapshot-2")
    assert(snap2.contains("new.csv") && !snap2.contains("old.csv"),
      s"eviction must be durable in the published snapshot:\n$snap2")
    assert(logFiles(ckpt).contains("0"), "dead chunk must survive the crash")

    // recovery unions snapshot + dead chunks: the evicted entry is
    // RESURRECTED into the in-memory admitted set — the safe direction
    // (set membership can only prevent re-admission, never cause it).
    // old.csv still sits in incoming; it must not be re-ingested, by
    // either membership or the marker-restored age refusal.
    val s2 = new CrashingClocked(base + 2 * r + 2000)
    s2.initialOffset()
    assert(s2.latestOffset().asInstanceOf[ChunkOffset].chunks == 2L,
      "crash recovery re-admitted an evicted file")

    // the next successful compaction re-evicts it durably and sweeps
    // every dead chunk (including the pre-crash orphans)
    Seq("f3.csv" -> 3, "f4.csv" -> 4).foreach { case (n, i) =>
      writeFile(in, n, s"loan_id,name,amount\n$i,c,3.0\n")
        .toFile.setLastModified(base + 2 * r)
      s2.now = base + 2 * r + 2000 + i * 1000
      assert(s2.latestOffset().asInstanceOf[ChunkOffset].chunks == i.toLong)
      s2.commit(ChunkOffset(i.toLong))
    }
    val names = logFiles(ckpt).filterNot(n => n.startsWith(".") || n.endsWith(".crc"))
    assert(names == Seq("snapshot-4"),
      s"compaction must sweep dead chunks and superseded snapshots: $names")
    val snap4 = logText(ckpt, "snapshot-4")
    assert(!snap4.contains("old.csv"),
      s"resurrected entry must re-evict at the next compaction:\n$snap4")
    assert(Seq("new.csv", "f3.csv", "f4.csv").forall(snap4.contains),
      s"live entries must all survive:\n$snap4")
  }

  test("an interval-gated commit touches no filesystem at all") {
    spark
    val in = tmpDir("nofs-in"); val ckpt = tmpDir("nofs-ckpt")
    val old = System.currentTimeMillis() - 60000
    val s = new Clocked(props(in, "compactInterval" -> "100"), ckpt.toString,
      System.currentTimeMillis())
    s.initialOffset()
    writeFile(in, "f1.csv", "loan_id,name,amount\n1,x,1.0\n").toFile.setLastModified(old)
    assert(s.latestOffset().asInstanceOf[ChunkOffset].chunks == 1L)
    // nuke the admission log out from under the source: a commit that
    // listed, read, or wrote ANYTHING in it would throw — the in-memory
    // interval gate must return before the first filesystem call (on an
    // object-store checkpoint that call is a remote LIST per micro-batch)
    import scala.jdk.CollectionConverters._
    val d = ckpt.resolve("graft-admitted")
    java.nio.file.Files.list(d).iterator().asScala.toSeq
      .foreach(java.nio.file.Files.delete)
    java.nio.file.Files.delete(d)
    s.commit(ChunkOffset(1))
  }
}
