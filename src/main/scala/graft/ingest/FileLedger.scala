package graft.ingest

import java.nio.charset.StandardCharsets
import java.time.Instant

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Exactly-once-per-file processed ledger — the reference pipeline's core
  * operational contract (ST3 in SURVEY.md §2.9): a small JSON document
  * holding the sorted set of already-processed file identifiers.
  *
  * Format matches the reference state file
  * (/root/reference/airflow/processed_drive_files.json, written by
  * drive_auto_compress_email.py:102-111):
  *
  * {{{
  * { "processed_file_ids": ["id1", "id2"], "last_updated": "<ISO-8601>" }
  * }}}
  *
  * Reads/writes go through the Hadoop FileSystem API, so the ledger can live
  * on any supported scheme (file://, hdfs://, s3a://) next to the data it
  * guards. A corrupt or missing ledger loads as empty, exactly like the
  * reference's defensive read (drive_auto_compress_email.py:92-101) — the
  * pipeline then reprocesses, which is safe because every downstream write
  * is an idempotent overwrite.
  */
object FileLedger {

  /** Load processed IDs; missing or unreadable ledger → empty set. */
  def load(ledgerPath: String, conf: Configuration = new Configuration()): Set[String] = {
    val path = new Path(ledgerPath)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) Set.empty
    else
      try {
        val in = fs.open(path)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        JsonMethods.parse(text) \ "processed_file_ids" match {
          case JArray(ids) => ids.collect { case JString(s) => s }.toSet
          case _           => Set.empty
        }
      } catch { case scala.util.control.NonFatal(_) => Set.empty }
  }

  /** Persist processed IDs (sorted, like the reference's
    * `_save_processed_file_ids(sorted(processed_ids))`), with an ISO-8601
    * `last_updated` stamp. Atomic enough for the single-writer contract
    * (ST2: one active run) the reference operates under.
    */
  def save(
      ledgerPath: String,
      ids: Set[String],
      conf: Configuration = new Configuration(),
      now: Instant = Instant.now()): Unit = {
    val payload = JObject(
      "processed_file_ids" -> JArray(ids.toSeq.sorted.map(JString(_)).toList),
      "last_updated" -> JString(now.toString))
    val path = new Path(ledgerPath)
    val fs: FileSystem = path.getFileSystem(conf)
    val out = fs.create(path, true)
    try out.write(JsonMethods.pretty(JsonMethods.render(payload)).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}
