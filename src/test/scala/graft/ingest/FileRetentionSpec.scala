package graft.ingest

import java.nio.file.{Files, Paths}
import java.time.Instant

import graft.SparkSpec

/** Retention window on the batch ledger — the invariant pair mirrored from
  * the streaming source: entries older than `maxFileAgeMs` are evicted at
  * save, files older than the window are refused at admission, both against
  * the same persisted monotonic reference, so eviction can never cause
  * re-ingestion and a restart can never regress the reference. (The
  * reference pipeline's own ledger grows forever —
  * drive_auto_compress_email.py:102-111; this bounds it.)
  */
class FileRetentionSpec extends SparkSpec {

  private val R = 10000L // retention window, ms

  private def setup(): (String, String, String, String) = {
    val root = tmpDir("retention")
    val incoming = root.resolve("incoming")
    Files.createDirectories(incoming)
    (incoming.toString, root.resolve("raw").toString,
      root.resolve("out").toString, root.resolve("ledger.json").toString)
  }

  private def put(dir: String, name: String, mtime: Long): java.nio.file.Path = {
    val p = Paths.get(dir, name)
    Files.writeString(p, s"loan_id\n${name.hashCode}\n")
    p.toFile.setLastModified(mtime)
    p
  }

  private def run(incoming: String, raw: String, out: String, ledger: String,
      nowMs: Long): FileIngest.BatchResult =
    FileIngest.processBatch(incoming, raw, out, ledger,
      minAgeSeconds = 0L, maxFileAgeMs = R, now = Instant.ofEpochMilli(nowMs))

  test("randomized arrival sequences: exactly-once and never-re-admit hold against an oracle model") {
    // model-based pin of the invariant pair under random interleavings:
    // files arrive with random mtimes (sometimes older than the window,
    // sometimes in the past relative to files already seen), batches run
    // at random times, files are sometimes deleted between runs. The
    // independent model tracks only the CONTRACT: (a) no file ever
    // processes twice; (b) a file refused as expired never processes
    // later; (c) a stabilized file inside the window processes in the
    // batch that first lists it. Fixed seeds for reproducibility.
    for (seed <- Seq(5L, 83L, 997L)) {
      val rng = new scala.util.Random(seed)
      val (incoming, raw, out, ledger) = setup()
      val base = 1_700_000_000_000L
      var now = base
      val everProcessed = scala.collection.mutable.Set.empty[String]
      val everExpired = scala.collection.mutable.Set.empty[String]
      val present = scala.collection.mutable.Map.empty[String, Long] // name -> mtime
      var nextId = 0
      (0 until 12).foreach { _ =>
        // random arrivals: mtime anywhere from far-past to now
        (0 until rng.nextInt(3)).foreach { _ =>
          val name = s"loan_r$nextId.csv"; nextId += 1
          val mtime = now - rng.nextLong(3 * R)
          put(incoming, name, mtime)
          present(name) = mtime
        }
        // random deletions of lingering files
        present.keys.toSeq.foreach { n =>
          if (rng.nextInt(5) == 0) { Files.delete(Paths.get(incoming, n)); present -= n }
        }
        now += rng.nextLong(R / 2)
        val res = run(incoming, raw, out, ledger, now)
        val processedNames = res.processed.map(_.filename)
        // (a) exactly-once, ever
        processedNames.foreach { n =>
          assert(!everProcessed.contains(n), s"seed=$seed: $n processed twice")
        }
        everProcessed ++= processedNames
        // (b) an expired verdict is final
        processedNames.foreach { n =>
          assert(!everExpired.contains(n), s"seed=$seed: expired $n re-admitted")
        }
        everExpired ++= res.expired.map(_.split('/').last)
        // (c) every present stabilized file was dealt with: processed
        // now, processed before, or expired (no silent loss)
        present.keys.foreach { n =>
          assert(everProcessed.contains(n) || everExpired.contains(n) ||
            processedNames.contains(n),
            s"seed=$seed: stabilized in-window file $n silently dropped")
        }
      }
      // a final quiet re-run is a no-op: nothing new, nothing re-done
      val fin = run(incoming, raw, out, ledger, now + 1)
      assert(fin.processed.isEmpty, s"seed=$seed: quiet re-run reprocessed ${fin.processed}")
    }
  }

  test("eviction + refusal share one reference: an evicted file still in incoming never re-ingests") {
    val (incoming, raw, out, ledger) = setup()
    val t0 = System.currentTimeMillis() - 10 * R

    put(incoming, "loan_old.csv", t0)
    val first = run(incoming, raw, out, ledger, t0 + 1000)
    assert(first.processed.map(_.filename) == Seq("loan_old.csv"))

    // a file 2R newer arrives: the reference jumps to its mtime, loan_old's
    // entry is now over-age -> evicted from the ledger in the same save
    put(incoming, "loan_new.csv", t0 + 2 * R)
    val second = run(incoming, raw, out, ledger, t0 + 2 * R + 1000)
    assert(second.processed.map(_.filename) == Seq("loan_new.csv"))
    val state = FileLedger.loadState(ledger)
    assert(state.ids.size == 1 && state.ids.head.endsWith("loan_new.csv"),
      s"over-age entry must be evicted, got ${state.ids}")
    assert(state.retentionRef == t0 + 2 * R)

    // loan_old is STILL in incoming and no longer ledgered — the listing
    // must refuse it by age, not re-ingest it
    val before = Files.readString(Paths.get(ledger))
    val third = run(incoming, raw, out, ledger, t0 + 2 * R + 2000)
    assert(third.processed.isEmpty,
      "evicted file was re-ingested — the invariant pair is broken")
    assert(third.expired.exists(_.endsWith("loan_old.csv")))
    // the ledger file itself stays bounded: still exactly one entry, and
    // the repeat refusal (reference already durable) skipped the rewrite
    assert(FileLedger.loadState(ledger).ids.size == 1)
    assert(Files.readString(Paths.get(ledger)) == before,
      "refusal against an already-persisted reference must not rewrite the ledger")
  }

  test("the reference is persisted: refusal survives deletion of every newer file (restart regression)") {
    val (incoming, raw, out, ledger) = setup()
    val t0 = System.currentTimeMillis() - 10 * R

    val a = put(incoming, "loan_a.csv", t0)
    run(incoming, raw, out, ledger, t0 + 1000)
    val b = put(incoming, "loan_b.csv", t0 + 2 * R)
    run(incoming, raw, out, ledger, t0 + 2 * R + 1000) // evicts loan_a, ref = t0+2R

    // every file whose mtime carried the reference vanishes; only a stale
    // newcomer remains. A listing-derived reference would be the stale
    // file's own mtime (age 0 -> admitted); the persisted retention_ref
    // must keep refusing it.
    Files.delete(a); Files.delete(b)
    put(incoming, "loan_stale.csv", t0)
    val res = run(incoming, raw, out, ledger, t0 + 2 * R + 2000)
    assert(res.processed.isEmpty && res.expired.size == 1,
      "reference regressed after newer files were deleted — over-age file was admitted")
    assert(FileLedger.loadState(ledger).retentionRef == t0 + 2 * R)
  }

  test("young files never advance the reference (an in-flight upload must not expire peers)") {
    val (incoming, raw, out, ledger) = setup()
    val now = System.currentTimeMillis()
    val window = 30000L
    // stale-but-valid file: 120s old, well past the 60s min-age
    put(incoming, "loan_s.csv", now - 120000L)
    // brand-new file: newest mtime in the listing but younger than min-age
    put(incoming, "loan_y.csv", now - 1000)
    val res = FileIngest.processBatch(incoming, raw, out, ledger,
      minAgeSeconds = 60L, maxFileAgeMs = window, now = Instant.ofEpochMilli(now))
    // if the young file's mtime advanced the reference, loan_s would be
    // over-age (119s > 30s window) and refused; stabilized-only advance
    // makes loan_s itself the reference (age 0) and admits it
    assert(res.processed.map(_.filename) == Seq("loan_s.csv"))
    assert(res.deferred.size == 1 && res.expired.isEmpty)
  }

  test("legacy reference-format ledger: loads, never evicts, stays reference-shaped without retention") {
    val (incoming, raw, out, ledger) = setup()
    val t0 = System.currentTimeMillis() - 10 * R

    // a ledger written by the legacy surface carries no retention fields
    FileLedger.save(ledger, Set("opaque-drive-id"), now = Instant.ofEpochMilli(t0))
    val text = Files.readString(Paths.get(ledger))
    assert(!text.contains("file_mtimes") && !text.contains("retention_ref"),
      "legacy save must stay byte-shaped like the reference's state file")
    val legacy = FileLedger.loadState(ledger)
    assert(legacy.ids == Set("opaque-drive-id"))
    assert(legacy.mtimes.isEmpty && legacy.retentionRef == Long.MinValue)

    // retention runs over it: a far-newer file pushes the reference 2R
    // ahead, but the unknown-age legacy entry must survive eviction
    put(incoming, "loan_new.csv", t0 + 2 * R)
    run(incoming, raw, out, ledger, t0 + 2 * R + 1000)
    val upgraded = FileLedger.loadState(ledger)
    assert(upgraded.ids.contains("opaque-drive-id"),
      "entry with unknown mtime was evicted — age cannot be established for legacy entries")
    assert(upgraded.ids.exists(_.endsWith("loan_new.csv")))
    // and the upgraded ledger now carries the retention fields
    val text2 = Files.readString(Paths.get(ledger))
    assert(text2.contains("file_mtimes") && text2.contains("retention_ref"))
  }

  test("unbounded default: no eviction, no expiry, ledger format unchanged by absent retention") {
    val (incoming, raw, out, ledger) = setup()
    val t0 = System.currentTimeMillis() - 100 * R
    put(incoming, "loan_a.csv", t0)
    FileIngest.processBatch(incoming, raw, out, ledger,
      minAgeSeconds = 0L, now = Instant.ofEpochMilli(t0 + 1000))
    put(incoming, "loan_b.csv", t0 + 50 * R)
    val res = FileIngest.processBatch(incoming, raw, out, ledger,
      minAgeSeconds = 0L, now = Instant.ofEpochMilli(t0 + 50 * R + 1000))
    assert(res.processed.size == 1 && res.expired.isEmpty)
    val state = FileLedger.loadState(ledger)
    assert(state.ids.size == 2, "default (unbounded) retention must keep every entry")
  }
}
