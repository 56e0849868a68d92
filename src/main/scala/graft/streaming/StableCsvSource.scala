package graft.streaming

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Min-age-stabilized CSV file stream — ST4 as a first-class STREAMING
  * property, not a landing-zone convention.
  *
  * The reference defers files younger than a stabilization age so
  * half-written uploads are never ingested
  * (drive_auto_compress_email.py:150-168, the `min_age_seconds` check in
  * its listing loop). Spark's built-in file stream source has no min-age
  * option (`modifiedBefore/After` are batch-only), and filtering young
  * files POST-source (e.g. on `_metadata.file_modification_time`) silently
  * LOSES them: the source's commit log marks a file consumed the moment
  * it is listed, so rows filtered "for now" never come back.
  *
  * Deferral therefore has to happen at ADMISSION time, which needs a
  * source: this is a Data Source V2 [[MicroBatchStream]] whose listing
  * admits a file only once `now - mtime >= minAgeMs`. A deferred file is
  * simply not part of any batch yet — it enters the first micro-batch
  * AFTER it stabilizes, exactly once.
  *
  * Exactly-once and replay: each `latestOffset` poll that finds newly
  * stable files writes their `(mtime, name)` entries to an admission-log
  * chunk under the query's checkpoint location
  * (`<checkpoint>/graft-admitted/<i>`); the offset is just the chunk
  * count. `planInputPartitions(start, end)` re-reads chunks [start, end)
  * — deterministic on recovery because the log, not the directory state,
  * defines every batch (the same WAL-then-process shape as Spark's own
  * FileStreamSourceLog). Chunks are published via write-to-tmp + atomic
  * rename, and log recovery ignores anything that is not a bare chunk
  * index or snapshot, so a crash between create and rename leaves a
  * harmless `.N.tmp` orphan instead of wedging every subsequent restart.
  *
  * Log compaction (long-running streams must not accumulate one file per
  * poll forever): once at least `compactInterval` chunks sit below the
  * committed offset, `commit(end)` folds them and the previous snapshot
  * into a single `snapshot-<n>` file — those batches are durably
  * processed and never replanned, but their file names must survive
  * restarts for admission dedup. Ordinary commits in between are cheap
  * no-ops (Spark's FileStreamSourceLog compacts on the same interval
  * principle). Recovery unions the highest-index snapshot with any
  * remaining chunks; a crash between snapshot publish and chunk deletion
  * only leaves redundant chunks whose contents are already in the
  * snapshot (set-union, harmless).
  *
  * Bounded admission state (`maxFileAgeMs`): without a retention limit
  * the admitted set — in driver memory AND in the snapshot — grows by
  * one entry per file EVER admitted, so a year-long ingest leaks.
  * With `maxFileAgeMs` set, compaction drops entries whose recorded
  * mtime has aged past the retention window, and the LISTING refuses
  * files older than the window — the invariant pair (evict only what
  * listing refuses) means eviction can never cause re-admission, the
  * same contract as the built-in file source's `maxFileAge`. Age is
  * measured against the LATEST stabilized file mtime ever seen
  * (`latestSeenMtime` — monotonic, rebuilt from the log's recorded
  * mtimes on restart), exactly like the built-in source's
  * latestTimestamp — NOT against the wall clock. Wall-clock aging would
  * break both directions: a query outage (or slow backlog drain) longer
  * than the window would silently drop every not-yet-admitted file, and
  * a driver clock step-back after an eviction could re-admit the
  * evicted file (duplicate rows). With the monotonic file-time
  * reference, an idle stream ages nothing, and eviction can never be
  * followed by a listing that accepts the same mtime. To make the
  * no-re-admission guarantee survive restarts even when the newest
  * stabilized file was never admitted (maxFilesPerTrigger deferral, or
  * deleted during downtime), every compaction persists the reference
  * itself as a dedicated `#ref\t<mtime>` marker line in the snapshot
  * (recognized explicitly by the log reader — path entries stay real
  * paths), and recovery restores `max(marker, admitted mtimes)`. Semantics to be clear about: the
  * window bounds how far BEHIND the newest stabilized file ingestion
  * reaches — an idle outage loses nothing (the reference does not
  * advance), but if uploads CONTINUED through an outage longer than
  * the window, files older than newest-minus-window are refused by
  * design, exactly as Spark's `maxFileAge` drops them. Remaining
  * caveat (shared with the built-in source): a file whose mtime is
  * REWRITTEN after its entry ages out counts as a new file.
  *
  * Decode semantics mirror Spark's CSV source: PERMISSIVE by default —
  * an unparsable cell nulls that field only (`mode=FAILFAST` makes it
  * throw); string fields preserve whitespace, an unquoted empty field
  * is null while a quoted `""` is the empty string (nullValue vs
  * emptyValue); timestamps accept ISO instants, offset datetimes
  * (`2024-01-01T00:00:00+02:00`), and zoneless SQL forms resolved in
  * UTC. Unsupported column types are rejected at stream construction,
  * never silently nulled. A cell longer than `maxCharsPerColumn`
  * (default 1 MiChar; <=0 = unlimited) follows the SAME per-cell
  * contract: the field nulls under PERMISSIVE (with a per-file WARN
  * counting dropped cells) and throws under FAILFAST — the limit is
  * enforced by the reader AFTER parsing, because a parser-level cap
  * at that value aborts univocity mid-file and would kill the whole
  * query for one pathological row. A second, far higher parser-level
  * hard cap (8x the limit, floor 4 MiChar) bounds memory against a
  * runaway cell (an unterminated quote swallowing a huge file):
  * blowing it truncates that one FILE at the offending record
  * (PERMISSIVE, logged) instead of OOMing the executor.
  *
  * Scale notes: one input partition per admitted file (micro-batch CSV
  * drops are file-at-a-time uploads; a 100 TB backlog arrives as many
  * files, which parallelize across executors — `maxFilesPerTrigger`
  * bounds admission per poll). The CSV decode is univocity — the same
  * parser Spark's own CSV source uses — over the declared schema
  * (string/long/int/double/timestamp/date/boolean), so RFC 4180
  * quoting INCLUDING embedded newlines is handled; the driver's Hadoop
  * configuration is shipped to executors so `hdfs://`/`s3a://` paths
  * read with the session's credentials.
  */
object StableCsvSource {
  val ProviderClass: String = classOf[StableCsvProvider].getName

  private[streaming] val SupportedTypes: Set[DataType] = Set(
    StringType, LongType, IntegerType, DoubleType, BooleanType, TimestampType, DateType)

  private[streaming] def validateSchema(schema: StructType): Unit =
    schema.fields.foreach { f =>
      if (!SupportedTypes.contains(f.dataType))
        throw new IllegalArgumentException(
          s"stable-csv: unsupported type ${f.dataType} for column '${f.name}'")
    }

  /** The parser-tier cap for a configured per-cell limit (tier 2 of the
    * cell-length defense — see the reader's cost-model comment): 8x the
    * limit with a 4 MiChar floor and a 64 MiChar ceiling (the ceiling
    * bounds the EAGER univocity buffer at 128 MB/reader — without it a
    * limit just under the lazy threshold would eagerly allocate ~1 GiB
    * per open reader); -1 (unlimited, lazy appender) for non-positive
    * limits and for limits above the ceiling, where the user has
    * explicitly chosen giant cells and owns the memory bound.
    */
  private[streaming] def parserHardCap(maxCharsPerColumn: Int): Int =
    if (maxCharsPerColumn <= 0) -1
    else if (maxCharsPerColumn > (1 << 26)) -1
    else math.min(math.max(maxCharsPerColumn.toLong * 8L, 1L << 22), 1L << 26).toInt

  /** Timestamp string → micros since epoch. Fallback chain: ISO instant
    * (`...Z`), offset datetime (`...+02:00`), then the zoneless SQL form
    * resolved in UTC explicitly — `Timestamp.valueOf` would use the
    * executor JVM's default zone.
    */
  private def timestampMicros(s: String): Long = {
    val t = s.replace(' ', 'T')
    val inst =
      try java.time.Instant.parse(s)
      catch {
        case _: java.time.format.DateTimeParseException =>
          try java.time.OffsetDateTime.parse(t).toInstant
          catch {
            case _: java.time.format.DateTimeParseException =>
              java.time.LocalDateTime.parse(t).toInstant(java.time.ZoneOffset.UTC)
          }
      }
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  /** One cell → one Catalyst value. Strings keep their exact bytes
    * (Spark CSV parity — a quoted `"  "` is a real value, and a quoted
    * `""` is the EMPTY STRING, not null): the parser is configured with
    * `emptyValue = ""`, so by the time a string cell reaches here, null
    * means the unquoted empty field (Spark's `nullValue` default) and
    * `""` means a deliberately quoted empty — both pass through as-is.
    * Other types trim first and treat whitespace-only as null. A
    * non-empty cell that fails to parse is nulled (PERMISSIVE) or
    * thrown (FAILFAST). Schema-level type support is checked at stream
    * construction, so the catch here only ever sees data errors.
    */
  private[streaming] def convert(raw: String, dt: DataType, failFast: Boolean): Any = {
    if (raw == null) return null
    if (dt == StringType) return UTF8String.fromString(raw)
    val s = raw.trim
    if (s.isEmpty) return null
    try dt match {
      case LongType => s.toLong
      case IntegerType => s.toInt
      case DoubleType => s.toDouble
      case BooleanType => s.toBoolean
      case TimestampType => timestampMicros(s)
      case DateType => java.time.LocalDate.parse(s).toEpochDay.toInt
      case other =>
        throw new IllegalStateException(s"stable-csv: unvalidated type $other")
    } catch {
      case e: IllegalStateException => throw e
      case scala.util.control.NonFatal(e) =>
        if (failFast) throw new IllegalArgumentException(
          s"stable-csv: cannot parse '$s' as $dt (mode=FAILFAST)", e)
        else null
    }
  }
}

class StableCsvProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "stable-csv requires an explicit schema (.schema(...)) — no inference over an unbounded source")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new StableCsvTable(schema, properties.asScala.toMap)
}

private[streaming] class StableCsvTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  StableCsvSource.validateSchema(schema)
  override def name(): String = s"stable-csv:${props.getOrElse("path", "?")}"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new StableCsvMicroBatchStream(schema, props, checkpointLocation)
      }
    }
}

private[streaming] case class ChunkOffset(chunks: Long) extends Offset {
  override def json(): String = chunks.toString
}

private[streaming] case class CsvFilePartition(
    path: String, header: Boolean, delim: Char, failFast: Boolean,
    maxCharsPerColumn: Int)
    extends InputPartition

private[streaming] class StableCsvMicroBatchStream(
    schema: StructType, props: Map[String, String], checkpointLocation: String)
    extends MicroBatchStream {

  private val dir = new Path(props.getOrElse("path",
    throw new IllegalArgumentException("stable-csv: option 'path' is required")))
  private val minAgeMs = props.getOrElse("minAgeMs", "0").toLong
  private val glob = props.getOrElse("pathGlobFilter", "*")
  private val header = props.getOrElse("header", "true").toBoolean
  private val delim = props.getOrElse("delimiter", ",").charAt(0)
  private val maxFilesPerTrigger = props.getOrElse("maxFilesPerTrigger", "1000").toInt
  /** Retention window for admission state; `Long.MaxValue` = unbounded. */
  private val maxFileAgeMs = props.getOrElse("maxFileAgeMs", Long.MaxValue.toString).toLong
  /** Fold committed chunks into a snapshot only once this many have
    * accumulated — ordinary commits are cheap no-ops, so lifetime
    * compaction I/O is O(n·len/interval), not O(n²).
    */
  private val compactInterval = props.getOrElse("compactInterval", "10").toInt
  /** Per-cell length bound, enforced reader-side post-parse (<=0 =
    * unlimited); an over-limit cell nulls (PERMISSIVE) or throws
    * (FAILFAST) like any other unparsable cell.
    */
  private val maxCharsPerColumn = props.getOrElse("maxCharsPerColumn", (1 << 20).toString).toInt
  private val failFast =
    props.getOrElse("mode", "PERMISSIVE").toUpperCase(java.util.Locale.ROOT) match {
      case "PERMISSIVE" => false
      case "FAILFAST" => true
      case m => throw new IllegalArgumentException(
        s"stable-csv: mode must be PERMISSIVE or FAILFAST, got '$m'")
    }
  StableCsvSource.validateSchema(schema)

  private val session = org.apache.spark.sql.SparkSession.active
  private val hadoopConf = session.sparkContext.hadoopConfiguration
  private def fs = dir.getFileSystem(hadoopConf)
  private val logDir = new Path(checkpointLocation, "graft-admitted")

  // admitted file → recorded mtime (for retention eviction) + chunk
  // count, rebuilt from the admission log on restart so a recovered
  // query never re-admits; bounded by maxFileAgeMs retention
  private var chunkCount: Long = -1L
  private val admitted = scala.collection.mutable.HashMap.empty[String, Long]
  // the retention reference: max mtime over every STABILIZED file seen
  // by a listing, monotonic within a run, rebuilt from the log's
  // recorded mtimes on restart (legacy no-mtime entries excluded — their
  // Long.MaxValue sentinel would refuse everything). Both the listing's
  // over-age refusal and compaction's eviction use this same value, so
  // monotonicity alone guarantees eviction can never precede a listing
  // that accepts the evicted mtime.
  private var latestSeenMtime: Long = Long.MinValue
  // chunks below this index are folded into the latest snapshot — the
  // in-memory census that lets interval-gated no-op commits skip the
  // filesystem entirely; rebuilt from the recovery listing, advanced at
  // each compaction
  private var snapshotBase: Long = 0L

  /** Test seams: fault-injection points the crash-recovery spec
    * overrides to throw, and an injectable clock for deterministic
    * retention tests. No-ops / wall clock in production.
    */
  protected def beforeRename(name: String): Unit = ()
  protected def afterSnapshotPublish(): Unit = ()
  protected def nowMs: Long = System.currentTimeMillis()

  /** One directory listing, parsed two ways below — on an object-store
    * checkpoint every listStatus is a remote LIST call, so recovery and
    * compaction each list exactly once and ordinary commits not at all.
    */
  private def logNames(lfs: org.apache.hadoop.fs.FileSystem): Seq[String] =
    lfs.listStatus(logDir).toSeq.map(_.getPath.getName)

  /** Committed chunk files only — bare numeric names. A crash between
    * tmp-create and rename leaves `.N.tmp`, which must not wedge
    * recovery (it is superseded or rewritten by the next poll).
    */
  private def chunkIndices(names: Seq[String]): Seq[Long] =
    names
      .filter(_.forall(_.isDigit))
      .filter(_.nonEmpty)
      .map(_.toLong)
      .sorted

  /** All committed snapshot indices — `snapshot-<n>` covers chunks
    * [0, n). More than one exists only after a crash between snapshot
    * publish and superseded-snapshot deletion; recovery reads the
    * highest, compaction deletes the rest.
    */
  private def snapshotIndices(names: Seq[String]): Seq[Long] =
    names
      .filter(_.startsWith("snapshot-"))
      .map(_.stripPrefix("snapshot-"))
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong)
      .sorted

  private def ensureLog(): Unit = if (chunkCount < 0) {
    val lfs = logDir.getFileSystem(hadoopConf)
    if (!lfs.exists(logDir)) { lfs.mkdirs(logDir); chunkCount = 0 }
    else {
      val names = logNames(lfs)
      val snap = snapshotIndices(names).lastOption
      // the snapshot may carry a `#ref` marker line — the persisted
      // latestSeenMtime, written at each compaction; it participates in
      // the reference rebuild below but never enters the admitted map
      val snapRef = snap.flatMap { n =>
        val (entries, ref) = readLogAndRef(s"snapshot-$n")
        admitted ++= entries
        ref
      }
      val idx = chunkIndices(names)
      idx.foreach(i => admitted ++= readLog(i.toString))
      snapshotBase = snap.getOrElse(0L)
      chunkCount = math.max(snap.getOrElse(0L), idx.lastOption.map(_ + 1).getOrElse(0L))
      // legacy marker form (an empty-path entry): fold its value in and
      // drop it from the map, so pre-#ref checkpoints restore identically
      val known = admitted.valuesIterator.filter(_ != Long.MaxValue) ++ snapRef.iterator
      if (known.nonEmpty) latestSeenMtime = known.max
      admitted.remove("")
    }
  }

  /** Log entries are `<mtime>\t<path>` lines; a line with no tab (the
    * pre-retention format) is a bare path whose age is unknown — kept
    * forever, the no-re-admission-safe direction. A `#ref\t<mtime>`
    * line is the persisted retention reference (snapshots only) —
    * recognized by prefix, returned separately, never an entry: the
    * path field of an entry is always a real path.
    */
  private def readLogAndRef(name: String): (Seq[(String, Long)], Option[Long]) = {
    val in = logDir.getFileSystem(hadoopConf).open(new Path(logDir, name))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val ref = lines.collectFirst { case l if l.startsWith(RefMarkerPrefix) =>
      l.stripPrefix(RefMarkerPrefix).toLong
    }
    val entries = lines.filter(l => l.nonEmpty && !l.startsWith(RefMarkerPrefix)).map { line =>
      val i = line.indexOf('\t')
      if (i < 0) (line, Long.MaxValue) else (line.substring(i + 1), line.substring(0, i).toLong)
    }
    (entries, ref)
  }

  private def readLog(name: String): Seq[(String, Long)] = readLogAndRef(name)._1

  private val RefMarkerPrefix = "#ref\t"

  private def writeLog(name: String, entries: Seq[(String, Long)],
      ref: Option[Long] = None): Unit = {
    val lfs = logDir.getFileSystem(hadoopConf)
    val tmp = new Path(logDir, s".$name.tmp")
    val out = lfs.create(tmp, true)
    try out.write(
      (ref.map(m => s"$RefMarkerPrefix$m").toSeq ++ entries.map { case (p, m) => s"$m\t$p" })
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    beforeRename(name)
    lfs.rename(tmp, new Path(logDir, name)) // atomic publish
  }

  override def initialOffset(): Offset = { ensureLog(); ChunkOffset(0L) }
  override def deserializeOffset(json: String): Offset = ChunkOffset(json.toLong)

  override def latestOffset(): Offset = {
    ensureLog()
    val now = nowMs
    val listed: Array[FileStatus] =
      try fs.globStatus(new Path(dir, glob)) match {
        case null => Array.empty
        case st => st
      }
      catch { case _: java.io.FileNotFoundException => Array.empty }
    // lower bound first: stabilization is wall-clock by definition (has
    // the writer finished?), and only STABILIZED files advance the
    // retention reference — a half-written upload must not age out its
    // older siblings
    val stabilized = listed.filter(f => f.isFile && now - f.getModificationTime >= minAgeMs)
    if (stabilized.nonEmpty)
      latestSeenMtime = math.max(latestSeenMtime, stabilized.map(_.getModificationTime).max)
    val stable = stabilized
      // upper bound: the retention window, relative to the newest
      // stabilized mtime ever seen (monotonic) — refusing over-age files
      // against the SAME reference compaction evicts by is what makes
      // eviction unable to re-admit (the invariant pair)
      .filter(f => latestSeenMtime - f.getModificationTime <= maxFileAgeMs)
      .map(f => f.getPath.toString -> f.getModificationTime)
      .filterNot { case (p, _) => admitted.contains(p) }
      // oldest first (mtime, then path for determinism): a bounded
      // trigger drains the backlog in arrival order, so an old file
      // cannot starve behind alphabetically-earlier newer files until
      // retention refuses it
      .sortBy { case (p, m) => (m, p) }
      .take(maxFilesPerTrigger)
    if (stable.nonEmpty) {
      writeLog(chunkCount.toString, stable.toSeq)
      admitted ++= stable
      chunkCount += 1
    }
    ChunkOffset(chunkCount)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    ensureLog()
    val s = start.asInstanceOf[ChunkOffset].chunks
    val e = end.asInstanceOf[ChunkOffset].chunks
    (s until e).flatMap(i => readLog(i.toString)).map { case (p, _) =>
      CsvFilePartition(p, header, delim, failFast, maxCharsPerColumn): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the DRIVER's Hadoop configuration (spark.hadoop.* overlays,
    // s3a credentials, ...) — a fresh Configuration() on the executor
    // would list-admit files the tasks then cannot open
    val confMap = hadoopConf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap
    new StableCsvReaderFactory(schema, confMap)
  }

  /** Compact the admission log: batches below `end` are durably
    * processed and never replanned, so once `compactInterval` of their
    * chunks have accumulated they fold into one `snapshot-<e>` (file
    * names retained for admission dedup on restart); commits in between
    * do nothing. Compaction is also where retention binds: entries older
    * than `maxFileAgeMs` leave the snapshot AND the in-memory admitted
    * map — safe because the listing refuses files that old, so an
    * evicted name can only return if its file's mtime is rewritten.
    * Crash-safe: the snapshot publishes atomically BEFORE the chunks it
    * covers are deleted — leftovers are redundant set members.
    */
  override def commit(end: Offset): Unit = {
    ensureLog()
    val e = end.asInstanceOf[ChunkOffset].chunks
    // interval gate from in-memory state alone: an ordinary commit makes
    // NO filesystem call at all (a long-running stream would otherwise
    // pay remote LIST calls every micro-batch on an object-store
    // checkpoint). Chunks in [snapshotBase, e) are the un-folded tail;
    // orphan chunks from a crashed compaction aren't counted here but
    // are swept by the next real compaction's listing below.
    if (e - snapshotBase < compactInterval) return
    val lfs = logDir.getFileSystem(hadoopConf)
    // one directory listing serves the whole compaction: highest snapshot
    // = merge base, all lower indices = the sweep set (an orphan from a
    // crash between chunk deletion and snapshot deletion is cleaned here
    // too — deleting only the merge base would keep it forever)
    val names = logNames(lfs)
    val snaps = snapshotIndices(names)
    val prev = snaps.lastOption
    if (e > prev.getOrElse(0L)) {
      val dead = chunkIndices(names).filter(_ < e)
      if (dead.size >= compactInterval) {
        val merged = (prev.map(n => readLog(s"snapshot-$n")).getOrElse(Seq.empty) ++
          dead.flatMap(i => readLog(i.toString))).distinctBy(_._1)
        // eviction ages against latestSeenMtime — the SAME monotonic
        // reference the listing refuses by — never the wall clock (a
        // clock step-back must not be able to re-admit an evicted file)
        val (evicted, kept) =
          merged.partition { case (p, m) =>
            p.nonEmpty && m != Long.MaxValue && latestSeenMtime - m > maxFileAgeMs
          }
        // persist the reference itself as a dedicated #ref marker line,
        // so a restart can never regress latestSeenMtime below the value
        // these evictions were decided against, even if the newest
        // stabilized file was never admitted (the empty-path filter
        // drops a legacy-format marker entry carried in from an old
        // snapshot — the new marker supersedes it)
        writeLog(s"snapshot-$e", kept.filterNot(_._1.isEmpty),
          ref = if (latestSeenMtime == Long.MinValue) None else Some(latestSeenMtime))
        afterSnapshotPublish()
        dead.foreach(i => lfs.delete(new Path(logDir, i.toString), false))
        snaps.filter(_ < e).foreach(n =>
          lfs.delete(new Path(logDir, s"snapshot-$n"), false))
        evicted.foreach { case (p, _) => admitted.remove(p) }
        snapshotBase = e
      }
    }
    // if compaction didn't run, still reconcile the census with what the
    // listing showed (a crashed compaction's published snapshot covers
    // chunks this driver's counter didn't know were folded) — otherwise
    // the gate would re-list on every subsequent commit
    snapshotBase = math.max(snapshotBase, prev.getOrElse(0L))
  }

  override def stop(): Unit = ()
}

private[streaming] class StableCsvReaderFactory(
    schema: StructType, hadoopProps: Map[String, String])
    extends PartitionReaderFactory {

  @transient private lazy val conf = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    hadoopProps.foreach { case (k, v) => c.set(k, v) }
    c
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CsvFilePartition]
    new PartitionReader[InternalRow] {
      private val path = new Path(p.path)
      private val in = path.getFileSystem(conf).open(path)
      // univocity — the parser behind Spark's own CSV source — handles
      // RFC 4180 quoting including embedded newlines and escaped quotes;
      // trimming is OFF so string columns see their exact bytes (Spark
      // CSV read parity); non-string conversion trims in convert()
      // Two-tier cell-length defense. The configured maxCharsPerColumn
      // is enforced per cell AFTER parsing (null-or-throw, like any
      // unparsable cell) — a parser-level cap at that value would throw
      // TextParsingException mid-file, which univocity cannot recover
      // from, killing the whole query for one oversized-but-buffered
      // cell. The parser still needs SOME bound, though: unlimited
      // buffering means a single runaway cell (an unterminated quote
      // swallowing the rest of a huge file) OOMs the executor before
      // the post-parse check ever sees it. So the parser cap sits well
      // ABOVE the cell limit (8x, floor 4 MiChar): cells between the
      // two tiers parse fine and null their field; a cell blowing the
      // hard cap truncates THIS FILE at that record (logged WARN,
      // remaining records of the file are unreadable — univocity state
      // is unreliable past the throw) in PERMISSIVE, or fails the
      // query in FAILFAST.
      //
      // Cost model, eyes open: a finite cap makes univocity allocate
      // char[hardCap] EAGERLY per reader (DefaultCharAppender), so the
      // default 8 MiChar cap costs 16 MB per open partition reader —
      // a deliberate price for a hard per-reader memory bound (32
      // concurrent readers = 512 MB, predictable; an unbounded lazy
      // appender is 0 MB until the one pathological file takes the
      // executor down). The eager allocation is itself CAPPED at
      // 64 MiChar (128 MB of char[]) — without the ceiling, a
      // configured limit just under the lazy-fallback threshold would
      // 8x to a ~1 GiB eager buffer per open reader, and a handful of
      // concurrent readers would OOM the executor before any data
      // flowed. The worst configurable eager case is therefore 128 MB
      // per reader (limit in (8 MiChar, 64 MiChar]); the 8x headroom
      // between the cell limit and the parser cap shrinks toward 1x
      // as the limit approaches the ceiling — a cell just over such a
      // giant limit then truncates its file (tier-1 behavior) instead
      // of nulling the cell, the right degradation when the user has
      // asked for cells within 8x of the bound anyway. A configured
      // limit ABOVE the ceiling falls back to the lazy unlimited
      // appender instead of eagerly allocating gigabytes (or throwing
      // "array size exceeds VM limit" at construction): at that size
      // the user has explicitly chosen giant cells and the memory
      // bound is theirs.
      private val hardCap: Int = StableCsvSource.parserHardCap(p.maxCharsPerColumn)
      private val parser = {
        val settings = new com.univocity.parsers.csv.CsvParserSettings
        settings.getFormat.setDelimiter(p.delim)
        settings.setHeaderExtractionEnabled(p.header)
        settings.setMaxCharsPerColumn(hardCap)
        settings.setLineSeparatorDetectionEnabled(true)
        settings.setIgnoreLeadingWhitespaces(false)
        settings.setIgnoreTrailingWhitespaces(false)
        // Spark CSV read defaults: a QUOTED empty field is the empty
        // string (emptyValue), an unquoted empty field stays null
        // (nullValue) — convert() relies on this distinction
        settings.setEmptyValue("")
        new com.univocity.parsers.csv.CsvParser(settings)
      }
      parser.beginParsing(new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
      private var current: InternalRow = _
      private var oversizedCells: Long = 0L
      override def next(): Boolean = {
        val cells =
          try parser.parseNext()
          catch {
            case e: com.univocity.parsers.common.TextParsingException =>
              if (p.failFast) throw new IllegalArgumentException(
                s"stable-csv: unparsable record in ${p.path} (mode=FAILFAST)", e)
              // the WARN reports the parser's OWN diagnosis (hard-cap
              // overflow is the common cause, but not the only one) —
              // whatever the reason, univocity's state is unreliable
              // past the throw, so the rest of this file is dropped
              org.slf4j.LoggerFactory.getLogger(classOf[StableCsvReaderFactory]).warn(
                s"stable-csv: truncating ${p.path} at an unparsable record; " +
                  "remaining records of this file are dropped (mode=PERMISSIVE). " +
                  s"Parser: ${Option(e.getMessage).getOrElse("?").linesIterator.next()}")
              null
          }
        if (cells == null) false
        else {
          val vals = schema.fields.zipWithIndex.map { case (f, i) =>
            val raw = if (i < cells.length) cells(i) else null
            val bounded =
              if (raw != null && p.maxCharsPerColumn > 0 && raw.length > p.maxCharsPerColumn) {
                if (p.failFast) throw new IllegalArgumentException(
                  s"stable-csv: cell of ${raw.length} chars in column '${f.name}' of ${p.path} " +
                    s"exceeds maxCharsPerColumn=${p.maxCharsPerColumn} (mode=FAILFAST)")
                oversizedCells += 1
                null
              } else raw
            StableCsvSource.convert(bounded, f.dataType, p.failFast)
          }
          current = InternalRow.fromSeq(vals.toIndexedSeq)
          true
        }
      }
      override def get(): InternalRow = current
      override def close(): Unit = {
        if (oversizedCells > 0)
          org.slf4j.LoggerFactory.getLogger(classOf[StableCsvReaderFactory]).warn(
            s"stable-csv: nulled $oversizedCells over-limit cell(s) " +
              s"(> ${p.maxCharsPerColumn} chars) in ${p.path} (mode=PERMISSIVE)")
        parser.stopParsing()
        in.close()
      }
    }
  }
}
