package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Compaction-crash recovery for the StableCsvSource admission log.
  * The crash-safety argument (StableCsvSource.scala: snapshot publishes
  * atomically BEFORE the chunks it covers are deleted; chunk publish is
  * tmp-create + rename) is load-bearing for exactly-once — these tests
  * inject faults at both windows via the `beforeRename` /
  * `afterSnapshotPublish` seams and assert recovery: the log unions
  * correctly, no file is re-admitted, and already-planned batches replan
  * identically.
  */
class StableCsvCrashSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("loan_id", LongType),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  private def props(in: java.nio.file.Path): Map[String, String] =
    Map("path" -> in.toString, "minAgeMs" -> "0", "pathGlobFilter" -> "*.csv",
      "compactInterval" -> "1")

  private def logFiles(ckpt: java.nio.file.Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val d = ckpt.resolve("graft-admitted")
    java.nio.file.Files.list(d).iterator().asScala.map(_.getFileName.toString)
      .filterNot(_.endsWith(".crc")) // Hadoop local-FS checksum sidecars
      .toSeq
  }

  private def logText(ckpt: java.nio.file.Path, name: String): String =
    java.nio.file.Files.readString(ckpt.resolve("graft-admitted").resolve(name))

  private def oldFile(in: java.nio.file.Path, name: String, id: Int): Unit =
    writeFile(in, name, s"loan_id,name,amount\n$id,x,1.0\n")
      .toFile.setLastModified(System.currentTimeMillis() - 60000)

  test("crash between snapshot publish and chunk deletion: union recovery, no re-admission, identical replan") {
    spark // active session for the stream ctor
    val in = tmpDir("crash1-in"); val ckpt = tmpDir("crash1-ckpt")
    val p = props(in)
    oldFile(in, "a.csv", 1)

    class CrashAfterSnapshot extends StableCsvMicroBatchStream(schema, p, ckpt.toString) {
      @volatile var armed = false
      override protected def afterSnapshotPublish(): Unit =
        if (armed) throw new RuntimeException("injected crash after snapshot publish")
    }
    val s1 = new CrashAfterSnapshot
    s1.initialOffset()
    assert(s1.latestOffset().asInstanceOf[ChunkOffset].chunks == 1L)
    s1.armed = true
    intercept[RuntimeException](s1.commit(ChunkOffset(1)))

    // the crash state: snapshot-1 published, the chunk it covers NOT deleted
    val afterCrash = logFiles(ckpt)
    assert(afterCrash.contains("snapshot-1") && afterCrash.contains("0"),
      s"expected snapshot + leftover chunk, got $afterCrash")

    // recovery: a fresh instance unions snapshot + redundant chunk (set
    // semantics) — the file is NOT re-admitted and batch 0 replans identically
    val s2 = new StableCsvMicroBatchStream(schema, p, ckpt.toString)
    s2.initialOffset()
    assert(s2.latestOffset().asInstanceOf[ChunkOffset].chunks == 1L,
      "recovery re-admitted a file already in the snapshot")
    val replan = s2.planInputPartitions(ChunkOffset(0), ChunkOffset(1))
    assert(replan.length == 1 && replan.head.asInstanceOf[CsvFilePartition].path.endsWith("a.csv"),
      "batch 0 must replan to exactly the same single file")

    // the next compaction dedups the redundant chunk: one entry per file
    oldFile(in, "b.csv", 2)
    assert(s2.latestOffset().asInstanceOf[ChunkOffset].chunks == 2L)
    s2.commit(ChunkOffset(2))
    val names = logFiles(ckpt)
    assert(names.count(_.startsWith("snapshot-")) == 1, s"stale snapshot not replaced: $names")
    val snap = logText(ckpt, names.find(_.startsWith("snapshot-")).get)
    val lines = snap.linesIterator.filter(_.nonEmpty).toSeq
    assert(lines.count(_.contains("a.csv")) == 1 && lines.count(_.contains("b.csv")) == 1,
      s"snapshot must hold each file exactly once:\n$snap")
  }

  test("crash between tmp-create and rename of a chunk: orphan ignored, admitted exactly once on recovery") {
    spark
    val in = tmpDir("crash2-in"); val ckpt = tmpDir("crash2-ckpt")
    val p = props(in)
    oldFile(in, "a.csv", 1)

    class CrashBeforeRename extends StableCsvMicroBatchStream(schema, p, ckpt.toString) {
      @volatile var armed = false
      override protected def beforeRename(name: String): Unit =
        if (armed) throw new RuntimeException("injected crash before rename")
    }
    val s1 = new CrashBeforeRename
    s1.initialOffset()
    s1.armed = true
    intercept[RuntimeException](s1.latestOffset())

    // the crash state: only the orphan tmp, no published chunk
    val afterCrash = logFiles(ckpt)
    assert(afterCrash == Seq(".0.tmp"), s"expected only the orphan tmp, got $afterCrash")

    // recovery: the orphan is ignored (not a bare index), the file is
    // admitted exactly once by the fresh instance's own poll
    val s2 = new StableCsvMicroBatchStream(schema, p, ckpt.toString)
    s2.initialOffset()
    assert(s2.latestOffset().asInstanceOf[ChunkOffset].chunks == 1L,
      "recovered instance must admit the file exactly once")
    val plan = s2.planInputPartitions(ChunkOffset(0), ChunkOffset(1))
    assert(plan.length == 1 && plan.head.asInstanceOf[CsvFilePartition].path.endsWith("a.csv"))
    // and a second poll admits nothing new
    assert(s2.latestOffset().asInstanceOf[ChunkOffset].chunks == 1L)
  }

  test("an orphaned older snapshot (crash between chunk and snapshot deletion) is swept by the next compaction") {
    spark
    val in = tmpDir("crash4-in"); val ckpt = tmpDir("crash4-ckpt")
    val p = props(in)
    oldFile(in, "a.csv", 1)
    val s = new StableCsvMicroBatchStream(schema, p, ckpt.toString)
    s.initialOffset()
    assert(s.latestOffset().asInstanceOf[ChunkOffset].chunks == 1L)
    s.commit(ChunkOffset(1)) // -> snapshot-1
    // simulate the crash window AFTER a previous compaction deleted its
    // chunks but BEFORE it deleted the superseded snapshot: a stale
    // lower-index snapshot left behind (recovery ignores it — only the
    // highest index is read — but it must not accumulate forever)
    java.nio.file.Files.writeString(
      ckpt.resolve("graft-admitted").resolve("snapshot-0"), "")
    oldFile(in, "b.csv", 2)
    assert(s.latestOffset().asInstanceOf[ChunkOffset].chunks == 2L)
    s.commit(ChunkOffset(2))
    val names = logFiles(ckpt).filterNot(_.startsWith("."))
    assert(names == Seq("snapshot-2"),
      s"compaction must sweep EVERY superseded snapshot, including orphans: $names")
  }

  test("crash between tmp-create and rename of a SNAPSHOT: old snapshot + chunks intact, compaction retries") {
    spark
    val in = tmpDir("crash3-in"); val ckpt = tmpDir("crash3-ckpt")
    val p = props(in)
    oldFile(in, "a.csv", 1)

    class CrashOnSnapshotRename extends StableCsvMicroBatchStream(schema, p, ckpt.toString) {
      @volatile var armed = false
      override protected def beforeRename(name: String): Unit =
        if (armed && name.startsWith("snapshot-")) throw new RuntimeException("injected")
    }
    val s1 = new CrashOnSnapshotRename
    s1.initialOffset()
    assert(s1.latestOffset().asInstanceOf[ChunkOffset].chunks == 1L)
    s1.armed = true
    intercept[RuntimeException](s1.commit(ChunkOffset(1)))

    // crash state: chunk 0 still published, no snapshot — nothing lost
    val afterCrash = logFiles(ckpt)
    assert(afterCrash.contains("0") && !afterCrash.exists(_.startsWith("snapshot-")),
      s"expected chunk only, got $afterCrash")

    // recovery: no re-admission; the next commit compacts successfully
    val s2 = new StableCsvMicroBatchStream(schema, p, ckpt.toString)
    s2.initialOffset()
    assert(s2.latestOffset().asInstanceOf[ChunkOffset].chunks == 1L)
    s2.commit(ChunkOffset(1))
    val names = logFiles(ckpt).filterNot(_.startsWith("."))
    assert(names == Seq("snapshot-1"), s"retry must compact cleanly: $names")
  }

  test("recovery after long uptime replans only the uncommitted tail, from live chunks") {
    // Long-running stream: many poll/commit rounds with compactInterval=2
    // fold the committed history into snapshots repeatedly, then one
    // batch is admitted but NOT committed (the crash window Spark
    // actually replays). Recovery must (a) find only the snapshot plus
    // the tail chunk on disk — the folded chunks are gone, so a replan
    // that touched them would throw — and (b) plan the tail range to
    // exactly its own files. This pins the invariant that compaction
    // folds only chunks below a durably-committed offset, which is what
    // keeps every recovery-replannable range above the fold line.
    spark
    val in = tmpDir("tail-in"); val ckpt = tmpDir("tail-ckpt")
    val p = props(in) + ("compactInterval" -> "2")

    val s1 = new StableCsvMicroBatchStream(schema, p, ckpt.toString)
    s1.initialOffset()
    (0 until 6).foreach { i =>
      oldFile(in, s"f$i.csv", i)
      assert(s1.latestOffset().asInstanceOf[ChunkOffset].chunks == i + 1L)
      s1.commit(ChunkOffset(i + 1L))
    }
    // admitted but never committed: the only range recovery may replay
    oldFile(in, "tail.csv", 99)
    assert(s1.latestOffset().asInstanceOf[ChunkOffset].chunks == 7L)

    // after three compactions (at e=2, 4, 6) the log holds exactly the
    // latest snapshot and the uncommitted tail chunk — O(window), not
    // O(uptime)
    val names = logFiles(ckpt).filterNot(_.startsWith("."))
    assert(names.sorted == Seq("6", "snapshot-6"),
      s"expected snapshot-6 + tail chunk 6 only, got $names")

    // recovery: fresh instance, checkpoint says [6, 7) is uncommitted
    val s2 = new StableCsvMicroBatchStream(schema, p, ckpt.toString)
    s2.initialOffset()
    val parts = s2.planInputPartitions(ChunkOffset(6), ChunkOffset(7))
    assert(parts.length == 1 &&
      parts.head.asInstanceOf[CsvFilePartition].path.endsWith("tail.csv"),
      "the uncommitted tail must replan to exactly its own file")
    // census intact: nothing re-admits, folded or not
    assert(s2.latestOffset().asInstanceOf[ChunkOffset].chunks == 7L,
      "recovery re-admitted files already folded into the snapshot")
  }
}
