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
  * stable files writes their names to an admission-log chunk under the
  * query's checkpoint location (`<checkpoint>/graft-admitted/<i>`); the
  * offset is just the chunk count. `planInputPartitions(start, end)`
  * re-reads chunks [start, end) — deterministic on recovery because the
  * log, not the directory state, defines every batch (the same
  * WAL-then-process shape as Spark's own FileStreamSourceLog). Chunks are
  * published via write-to-tmp + atomic rename, and log recovery ignores
  * anything that is not a bare chunk index or snapshot, so a crash
  * between create and rename leaves a harmless `.N.tmp` orphan instead
  * of wedging every subsequent restart.
  *
  * Log compaction (long-running streams must not accumulate one file
  * per poll forever): `commit(end)` folds every chunk below the
  * committed offset into a single `snapshot-<n>` file — those batches
  * are durably processed and never replanned, but their file names must
  * survive restarts for admission dedup. Recovery unions the
  * highest-index snapshot with any remaining chunks; a crash between
  * snapshot publish and chunk deletion only leaves redundant chunks
  * whose contents are already in the snapshot (set-union, harmless).
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

  private[streaming] def convert(raw: String, dt: DataType): Any = {
    if (raw == null) return null
    val s = raw.trim
    if (s.isEmpty) null
    else dt match {
      case StringType => UTF8String.fromString(raw)
      case LongType => s.toLong
      case IntegerType => s.toInt
      case DoubleType => s.toDouble
      case BooleanType => s.toBoolean
      case TimestampType => // micros since epoch; ISO instant or SQL form.
        // The SQL form carries no zone: resolve it in UTC explicitly —
        // Timestamp.valueOf would use the executor JVM's default zone.
        val inst =
          try java.time.Instant.parse(s)
          catch {
            case _: java.time.format.DateTimeParseException =>
              java.time.LocalDateTime.parse(s.replace(' ', 'T'))
                .toInstant(java.time.ZoneOffset.UTC)
          }
        inst.getEpochSecond * 1000000L + inst.getNano / 1000L
      case DateType => // days since epoch
        java.time.LocalDate.parse(s).toEpochDay.toInt
      case other =>
        throw new IllegalArgumentException(s"stable-csv: unsupported type $other")
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

private[streaming] case class CsvFilePartition(path: String, header: Boolean, delim: Char)
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

  private val session = org.apache.spark.sql.SparkSession.active
  private val hadoopConf = session.sparkContext.hadoopConfiguration
  private def fs = dir.getFileSystem(hadoopConf)
  private val logDir = new Path(checkpointLocation, "graft-admitted")

  // admitted file set + chunk count, rebuilt from the admission log on
  // restart so a recovered query never re-admits
  private var chunkCount: Long = -1L
  private val admitted = scala.collection.mutable.HashSet.empty[String]

  /** Committed chunk files only — bare numeric names. A crash between
    * tmp-create and rename leaves `.N.tmp`, which must not wedge
    * recovery (it is superseded or rewritten by the next poll).
    */
  private def chunkIndices(lfs: org.apache.hadoop.fs.FileSystem): Seq[Long] =
    lfs.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .filter(_.forall(_.isDigit))
      .filter(_.nonEmpty)
      .map(_.toLong)
      .sorted

  /** Highest snapshot index, if any — `snapshot-<n>` covers chunks [0, n). */
  private def snapshotIndex(lfs: org.apache.hadoop.fs.FileSystem): Option[Long] =
    lfs.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("snapshot-"))
      .map(_.stripPrefix("snapshot-"))
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong)
      .sorted.lastOption

  private def ensureLog(): Unit = if (chunkCount < 0) {
    val lfs = logDir.getFileSystem(hadoopConf)
    if (!lfs.exists(logDir)) { lfs.mkdirs(logDir); chunkCount = 0 }
    else {
      val snap = snapshotIndex(lfs)
      snap.foreach(n => admitted ++= readLog(s"snapshot-$n"))
      val idx = chunkIndices(lfs)
      idx.foreach(i => admitted ++= readLog(i.toString))
      chunkCount = math.max(snap.getOrElse(0L), idx.lastOption.map(_ + 1).getOrElse(0L))
    }
  }

  private def readLog(name: String): Seq[String] = {
    val in = logDir.getFileSystem(hadoopConf).open(new Path(logDir, name))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  private def writeLog(name: String, files: Seq[String]): Unit = {
    val lfs = logDir.getFileSystem(hadoopConf)
    val tmp = new Path(logDir, s".$name.tmp")
    val out = lfs.create(tmp, true)
    try out.write(files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    lfs.rename(tmp, new Path(logDir, name)) // atomic publish
  }

  override def initialOffset(): Offset = { ensureLog(); ChunkOffset(0L) }
  override def deserializeOffset(json: String): Offset = ChunkOffset(json.toLong)

  override def latestOffset(): Offset = {
    ensureLog()
    val now = System.currentTimeMillis()
    val listed: Array[FileStatus] =
      try fs.globStatus(new Path(dir, glob)) match {
        case null => Array.empty
        case st => st
      }
      catch { case _: java.io.FileNotFoundException => Array.empty }
    val stable = listed
      .filter(f => f.isFile && now - f.getModificationTime >= minAgeMs)
      .map(_.getPath.toString)
      .filterNot(admitted.contains)
      .sorted // deterministic admission order within a chunk
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
    (s until e).flatMap(i => readLog(i.toString)).map(p =>
      CsvFilePartition(p, header, delim): InputPartition).toArray
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
    * processed and never replanned, so their chunks fold into one
    * `snapshot-<e>` (file names retained for admission dedup on
    * restart). Crash-safe: the snapshot publishes atomically BEFORE the
    * chunks it covers are deleted — leftovers are redundant set members.
    */
  override def commit(end: Offset): Unit = {
    ensureLog()
    val e = end.asInstanceOf[ChunkOffset].chunks
    val lfs = logDir.getFileSystem(hadoopConf)
    val prev = snapshotIndex(lfs)
    if (e > prev.getOrElse(0L)) {
      val dead = chunkIndices(lfs).filter(_ < e)
      if (dead.nonEmpty) {
        val merged = prev.map(n => readLog(s"snapshot-$n")).getOrElse(Seq.empty) ++
          dead.flatMap(i => readLog(i.toString))
        writeLog(s"snapshot-$e", merged.distinct)
        dead.foreach(i => lfs.delete(new Path(logDir, i.toString), false))
        prev.foreach(n => lfs.delete(new Path(logDir, s"snapshot-$n"), false))
      }
    }
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
      // RFC 4180 quoting including embedded newlines and escaped quotes
      private val parser = {
        val settings = new com.univocity.parsers.csv.CsvParserSettings
        settings.getFormat.setDelimiter(p.delim)
        settings.setHeaderExtractionEnabled(p.header)
        settings.setMaxCharsPerColumn(1 << 20)
        settings.setLineSeparatorDetectionEnabled(true)
        new com.univocity.parsers.csv.CsvParser(settings)
      }
      parser.beginParsing(new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
      private var current: InternalRow = _
      override def next(): Boolean = {
        val cells = parser.parseNext()
        if (cells == null) false
        else {
          val vals = schema.fields.zipWithIndex.map { case (f, i) =>
            if (i < cells.length) StableCsvSource.convert(cells(i), f.dataType) else null
          }
          current = InternalRow.fromSeq(vals.toIndexedSeq)
          true
        }
      }
      override def get(): InternalRow = current
      override def close(): Unit = { parser.stopParsing(); in.close() }
    }
  }
}
