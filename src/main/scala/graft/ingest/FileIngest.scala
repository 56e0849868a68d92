package graft.ingest

import java.time.Instant
import java.util.zip.GZIPOutputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Incremental file-arrival ingestion: discovery, admission, stabilization,
  * exactly-once dedup, landing copy, and gzip compression with per-file
  * metrics — the engine-side re-expression of the reference DAG's
  * `process_new_drive_files` (drive_auto_compress_email.py:160-339) minus
  * the external connectors (Drive/MinIO/SMTP are pure I/O, out of engine
  * scope per SURVEY.md §2.1 S6-S8).
  *
  * All filesystem access goes through the Hadoop FileSystem API, so source
  * and destination directories may live on any supported scheme — local
  * file://, hdfs://, or an s3a:// object store (the reference's MinIO
  * target speaks exactly that protocol).
  *
  * Semantics mirrored from the reference:
  *   - admission: name must start with `namePrefix` and end with
  *     `nameSuffix` (drive_auto_compress_email.py:52,203-204);
  *   - stabilization: files younger than `minAgeSeconds` are deferred to a
  *     later run, so partially-uploaded files are never read
  *     (MIN_FILE_AGE_SECONDS, drive_auto_compress_email.py:71,227-238);
  *   - exactly-once: files whose ID is in the ledger are skipped; the
  *     ledger is saved once per batch after all files land
  *     (drive_auto_compress_email.py:184,207,336);
  *   - landing copy incoming → raw keeps the landing zone intact
  *     (drive_auto_compress_email.py:274-282);
  *   - compression metrics: original size, gzip size, ratio
  *     (drive_auto_compress_email.py:285,294-303).
  */
object FileIngest {

  /** Per-file result — the reference's `processed_summaries` entry
    * (drive_auto_compress_email.py:316-325).
    */
  final case class CompressionStats(
      fileId: String,
      filename: String,
      originalSize: Long,
      compressedSize: Long,
      compressionRatio: Double,
      rawPath: String,
      compressedPath: String)

  final case class BatchResult(processed: Seq[CompressionStats], deferred: Seq[String],
      rejected: Seq[String])

  /** The file's stable identifier: its fully-qualified URI. (The reference
    * uses the Drive file ID; for filesystem sources the URI is the
    * equivalent stable handle.)
    */
  def fileId(st: FileStatus): String = st.getPath.toUri.toString

  /** One ingest batch over `incomingDir`:
    *
    *   1. discover candidate files;
    *   2. admit by name pattern, drop already-processed, defer too-young;
    *   3. copy admitted files to `rawDir` (landing copy);
    *   4. gzip each into `outputDir` and record size metrics;
    *   5. append the batch to the ledger.
    *
    * Re-running the same batch is a no-op: every admitted file's ID is in
    * the ledger afterwards. Partial failure re-runs are safe because copies
    * and gzip outputs are overwrites.
    */
  def processBatch(
      incomingDir: String,
      rawDir: String,
      outputDir: String,
      ledgerPath: String,
      namePrefix: String = "loan_",
      nameSuffix: String = ".csv",
      minAgeSeconds: Long = 60L,
      conf: Configuration = new Configuration(),
      now: Instant = Instant.now()): BatchResult = {

    val inPath = new Path(incomingDir)
    val fs = inPath.getFileSystem(conf)
    val processed = FileLedger.load(ledgerPath, conf)

    val candidates: Seq[FileStatus] =
      if (!fs.exists(inPath)) Seq.empty
      else fs.listStatus(inPath).toIndexedSeq.filter(_.isFile).sortBy(_.getPath.getName)

    val (admitted, rejected) = candidates.partition { st =>
      val n = st.getPath.getName
      n.startsWith(namePrefix) && n.endsWith(nameSuffix)
    }
    val fresh = admitted.filterNot(st => processed.contains(fileId(st)))
    val (ready, deferred) = fresh.partition { st =>
      (now.toEpochMilli - st.getModificationTime) / 1000.0 >= minAgeSeconds
    }

    fs.mkdirs(new Path(rawDir))
    fs.mkdirs(new Path(outputDir))

    val stats = ready.map { st =>
      val name = st.getPath.getName
      val rawPath = new Path(rawDir, name)
      val gzPath = new Path(outputDir, s"$name.gz")
      copy(fs, st.getPath, fs, rawPath, conf)
      val originalSize = st.getLen
      val compressedSize = gzipTo(fs, st.getPath, fs, gzPath)
      CompressionStats(
        fileId = fileId(st),
        filename = name,
        originalSize = originalSize,
        compressedSize = compressedSize,
        compressionRatio = if (originalSize > 0) compressedSize.toDouble / originalSize else 0.0,
        rawPath = rawPath.toString,
        compressedPath = gzPath.toString)
    }

    if (stats.nonEmpty)
      FileLedger.save(ledgerPath, processed ++ stats.map(_.fileId), conf, now)

    BatchResult(stats, deferred.map(fileId), rejected.map(st => st.getPath.getName))
  }

  private def copy(srcFs: FileSystem, src: Path, dstFs: FileSystem, dst: Path,
      conf: Configuration): Unit = {
    val in = srcFs.open(src)
    try {
      val out = dstFs.create(dst, true)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, conf, false)
      finally out.close()
    } finally in.close()
  }

  /** Stream-compress src into a gzip file at dst; returns compressed size. */
  private def gzipTo(srcFs: FileSystem, src: Path, dstFs: FileSystem, dst: Path): Long = {
    val in = srcFs.open(src)
    try {
      val rawOut = dstFs.create(dst, true)
      val gz = new GZIPOutputStream(rawOut, 64 * 1024)
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) gz.write(buf, 0, n)
          n = in.read(buf)
        }
      } finally gz.close()
    } finally in.close()
    dstFs.getFileStatus(dst).getLen
  }
}
