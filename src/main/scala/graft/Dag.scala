package graft

import java.nio.charset.StandardCharsets
import java.time.Instant

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.etl.{Aggregates, Pipeline, Sessions}
import graft.ingest.FileIngest
import graft.report.Summary

/** The end-to-end pipeline composition — the reference DAG's task chain
  * `poll_and_process_drive_files >> run_spark_etl >> send_summary_email`
  * (drive_auto_compress_email.py:577-602) as one callable unit:
  *
  *   1. ingest batch ([[graft.ingest.FileIngest.processBatch]]): discover
  *      `incomingDir`, admit by name pattern, defer files younger than
  *      `minAgeSeconds`, skip ledgered files, land admitted CSVs into
  *      `<work>/raw`, gzip them into `<work>/compressed` with size
  *      metrics, append the batch to `<work>/ledger.json`
  *      (process_new_drive_files, drive_auto_compress_email.py:160-339);
  *   2. ETL ([[graft.etl.Pipeline.run]]): full recompute over the ENTIRE
  *      raw dir — like the reference, each run re-reads everything landed
  *      so far, not just this batch's files (run_spark_etl_task,
  *      drive_auto_compress_email.py:522-536) — writing cleaned +
  *      aggregates parquet under `<work>/output`;
  *   3. report: when (and only when) this run processed new files, render
  *      the HTML summary over this batch's compression stats and the
  *      latest aggregates, and write it to `<work>/report.html`
  *      (send_combined_email_task skips the email when XCom is empty,
  *      drive_auto_compress_email.py:538-563; SMTP delivery itself is a
  *      connector, out of engine scope per SURVEY.md §2.1).
  *
  * All paths go through the Hadoop FileSystem API, so `incomingDir` and
  * `workDir` may live on `file://`, `hdfs://`, or `s3a://`. The ETL stage
  * is distributed; ingest landing (copy + gzip) is driver-side file
  * plumbing for small batches — exactly as the reference's PythonOperator
  * is — and runs as a Spark job over the file list once the admitted
  * batch reaches `FileIngest`'s distribute threshold, with the ledger
  * append staying a driver-side commit point either way.
  *
  * Usage: `runMain graft.Dag <incomingDir> <workDir> [minAgeSeconds]`.
  * Re-running is safe and incremental: the ledger makes ingest
  * exactly-once per file, the ETL is a deterministic overwrite, and the
  * report is only emitted for runs that ingested something new.
  */
object Dag {

  final case class RunResult(
      batch: FileIngest.BatchResult,
      etl: Option[Pipeline.Result],
      reportPath: Option[String],
      // the mailer payload is (subject, html body); SMTP delivery itself
      // is a connector, out of engine scope (SURVEY.md §2.1)
      reportSubject: Option[String])

  def run(
      spark: SparkSession,
      incomingDir: String,
      workDir: String,
      minAgeSeconds: Long = 60L,
      maxFileAgeMs: Long = Long.MaxValue,
      namePrefix: String = "loan_",
      nameSuffix: String = ".csv",
      coalesceOutput: Boolean = true,
      now: Instant = Instant.now()): RunResult = {

    val conf = spark.sparkContext.hadoopConfiguration
    val rawDir = s"$workDir/raw"

    val batch = FileIngest.processBatch(
      incomingDir = incomingDir,
      rawDir = rawDir,
      outputDir = s"$workDir/compressed",
      ledgerPath = s"$workDir/ledger.json",
      namePrefix = namePrefix,
      nameSuffix = nameSuffix,
      minAgeSeconds = minAgeSeconds,
      maxFileAgeMs = maxFileAgeMs,
      conf = conf,
      now = now,
      spark = Some(spark))

    // Nothing may have landed yet (first run with every file deferred):
    // an unmatched glob makes spark.read throw, so probe the landing zone
    // first and mirror the reference's "no input data" no-op
    // (run_spark_etl_task, drive_auto_compress_email.py:531-535).
    val rawPath = new Path(rawDir)
    val rawFs = rawPath.getFileSystem(conf)
    val hasLanded = rawFs.exists(rawPath) &&
      rawFs.listStatus(rawPath).exists(st => st.isFile && st.getPath.getName.endsWith(nameSuffix))
    val etl =
      if (!hasLanded) None
      else Pipeline.run(spark, rawDir, s"$workDir/output",
        coalesceOutput = coalesceOutput, globPattern = s"*$nameSuffix")

    val reportPath =
      if (batch.processed.isEmpty) None
      else {
        val aggregates = etl
          .map(r => Aggregates.latestSummary(spark, r.aggregatesPath))
          .getOrElse(Seq.empty)
        val html = Summary.renderHtml(
          batch.processed, aggregates,
          runTime = now.toString, source = incomingDir)
        val p = new Path(s"$workDir/report.html")
        val fs = p.getFileSystem(conf)
        val out = fs.create(p, true)
        try out.write(html.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        Some(p.toString)
      }

    RunResult(batch, etl, reportPath,
      reportPath.map(_ => Summary.subject(batch.processed.size)))
  }

  /** The chain on a fixed schedule — the reference DAG's
    * `schedule_interval=timedelta(minutes=1)`
    * (drive_auto_compress_email.py:582) as a long-running command. Runs
    * are strictly sequential (ST2: the next starts only after the
    * previous finishes, then waits out the interval — ST1's
    * fixed-interval trigger), each with single-run semantics: the shared
    * ledger makes every iteration exactly-once over whatever arrived
    * since the last. A tick that throws is logged and the loop
    * continues — the scheduler this mirrors fails that one DAG run and
    * still fires the next, and every tick is independently idempotent
    * (ledger-gated ingest, overwrite ETL), so a transient failure
    * (object-store 503, network blip) must not kill a long-running
    * service. `iterations = 0` loops forever; `sleep` and `clock` are
    * seams so tests drive arrivals between iterations deterministically.
    */
  def runLoop(
      spark: SparkSession,
      incomingDir: String,
      workDir: String,
      intervalSeconds: Long,
      minAgeSeconds: Long = 60L,
      maxFileAgeMs: Long = Long.MaxValue,
      iterations: Long = 0L,
      sleep: Long => Unit = Thread.sleep,
      clock: () => Instant = () => Instant.now(),
      onRun: RunResult => Unit = _ => ()): Unit = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    var i = 0L
    var done = false
    while (!done) {
      // the run and the result delivery fail DIFFERENTLY: a failed run
      // committed nothing (ledger untouched → the next tick retries the
      // same files), while a failed onRun follows a COMMITTED run — the
      // ledger already holds its files, so this result will never be
      // re-delivered and the error must say exactly what was dropped
      val result =
        try Some(run(spark, incomingDir, workDir,
          minAgeSeconds = minAgeSeconds, maxFileAgeMs = maxFileAgeMs, now = clock()))
        catch {
          case scala.util.control.NonFatal(e) =>
            log.warn(s"dag tick failed before commit — its files will be " +
              s"retried next tick (in ${intervalSeconds}s)", e)
            None
        }
      result.foreach { r =>
        try onRun(r)
        catch {
          case scala.util.control.NonFatal(e) =>
            log.error(s"dag tick result delivery failed AFTER commit — " +
              s"${r.batch.processed.size} processed file(s) " +
              s"(${r.batch.processed.map(_.filename).mkString(", ")}) are " +
              "ledgered and this result will not be re-delivered", e)
        }
      }
      i += 1
      if (iterations > 0 && i >= iterations) done = true
      else sleep(intervalSeconds * 1000L)
    }
  }

  private def printRun(r: RunResult): Unit = {
    println(s"ingested: ${r.batch.processed.size} file(s) " +
      s"(deferred ${r.batch.deferred.size}, rejected ${r.batch.rejected.size}, " +
      s"expired ${r.batch.expired.size})")
    r.batch.processed.foreach(s => println(
      s"  ${s.filename}: ${Summary.formatSize(s.originalSize)} -> " +
        s"${Summary.formatSize(s.compressedSize)} (ratio ${f"${s.compressionRatio}%.3f"})"))
    r.etl match {
      case Some(e) => println(s"etl: ${e.rowCount} cleaned rows -> ${e.cleanedPath}")
      case None => println("etl: no input data")
    }
    println(r.reportPath.fold("report: skipped (no new files this run)")(p =>
      s"report: $p (subject: ${r.reportSubject.getOrElse("")})"))
  }

  def main(args: Array[String]): Unit = {
    // `--interval <seconds>` anywhere in the arg list turns the one-shot
    // run into the reference's every-N-seconds loop
    val (flagArgs, positional) = {
      val i = args.indexOf("--interval")
      if (i < 0) (None, args.toSeq)
      else {
        require(i + 1 < args.length, "--interval requires a <seconds> value")
        (Some(args(i + 1).toLong), args.toSeq.patch(i, Nil, 2))
      }
    }
    require(positional.length >= 2,
      "usage: graft.Dag <incomingDir> <workDir> [minAgeSeconds] [maxFileAgeMs] [--interval <seconds>]")
    val minAge = positional.lift(2).map(_.toLong).getOrElse(60L)
    val maxAge = positional.lift(3).map(_.toLong).getOrElse(Long.MaxValue)
    val spark = Sessions.builder("GraftDag").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try flagArgs match {
      case Some(interval) =>
        runLoop(spark, positional(0), positional(1), interval,
          minAgeSeconds = minAge, maxFileAgeMs = maxAge, onRun = printRun)
      case None =>
        printRun(run(spark, positional(0), positional(1),
          minAgeSeconds = minAge, maxFileAgeMs = maxAge))
    } finally spark.stop()
  }
}
