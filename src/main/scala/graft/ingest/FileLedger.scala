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
  * Format is a superset of the reference state file
  * (/root/reference/airflow/processed_drive_files.json, written by
  * drive_auto_compress_email.py:102-111):
  *
  * {{{
  * { "processed_file_ids": ["id1", "id2"], "last_updated": "<ISO-8601>",
  *   "file_mtimes": {"id1": 1700000000000}, "retention_ref": 1700000000000 }
  * }}}
  *
  * `file_mtimes` and `retention_ref` exist so ingest can bound the ledger
  * with a retention window (the reference's own ledger grows one entry per
  * file forever): a reader that knows only the reference format still sees
  * exactly its `processed_file_ids` list, and a legacy ledger without the
  * extra fields loads with no mtimes and no reference — its entries are
  * conservatively never evicted, since their age is unknown.
  *
  * Reads/writes go through the Hadoop FileSystem API, so the ledger can live
  * on any supported scheme (file://, hdfs://, s3a://) next to the data it
  * guards. A corrupt or missing ledger loads as empty, exactly like the
  * reference's defensive read (drive_auto_compress_email.py:92-101) — the
  * pipeline then reprocesses, which is safe because every downstream write
  * is an idempotent overwrite.
  */
object FileLedger {

  /** Full ledger state: processed IDs, their recorded mtimes (epoch ms;
    * absent for entries written by a pre-retention ledger), and the
    * persisted retention reference — the max mtime over every stabilized
    * file ingest has ever listed, `Long.MinValue` when never recorded.
    * Persisting the reference (not just entry mtimes) means a restart can
    * never regress it below the value past evictions were decided
    * against, even when the newest stabilized file was itself refused or
    * deleted — the same marker discipline as the streaming source's
    * snapshot ([[graft.streaming.StableCsvSource]]).
    */
  final case class State(
      ids: Set[String],
      mtimes: Map[String, Long],
      retentionRef: Long) {
    def contains(id: String): Boolean = ids.contains(id)
  }

  object State {
    val empty: State = State(Set.empty, Map.empty, Long.MinValue)
  }

  /** Load the full state; missing or unreadable ledger → empty. */
  def loadState(ledgerPath: String, conf: Configuration = new Configuration()): State = {
    val path = new Path(ledgerPath)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) State.empty
    else
      try {
        val in = fs.open(path)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val root = JsonMethods.parse(text)
        val ids = root \ "processed_file_ids" match {
          case JArray(xs) => xs.collect { case JString(s) => s }.toSet
          case _          => Set.empty[String]
        }
        val mtimes = root \ "file_mtimes" match {
          case JObject(fields) =>
            fields.collect { case (k, JInt(v)) => k -> v.toLong }.toMap
          case _ => Map.empty[String, Long]
        }
        val ref = root \ "retention_ref" match {
          case JInt(v) => v.toLong
          case _       => Long.MinValue
        }
        State(ids, mtimes.filter { case (k, _) => ids.contains(k) }, ref)
      } catch { case scala.util.control.NonFatal(_) => State.empty }
  }

  /** Load processed IDs only (legacy surface). */
  def load(ledgerPath: String, conf: Configuration = new Configuration()): Set[String] =
    loadState(ledgerPath, conf).ids

  /** Persist the full state (IDs sorted, like the reference's
    * `_save_processed_file_ids(sorted(processed_ids))`), with an ISO-8601
    * `last_updated` stamp. The retention fields are omitted when empty, so
    * a ledger written without them is byte-shaped like the reference's.
    * Atomic enough for the single-writer contract (ST2: one active run)
    * the reference operates under.
    */
  def saveState(
      ledgerPath: String,
      state: State,
      conf: Configuration = new Configuration(),
      now: Instant = Instant.now()): Unit = {
    val base = List(
      "processed_file_ids" -> JArray(state.ids.toSeq.sorted.map(JString(_)).toList),
      "last_updated" -> (JString(now.toString): JValue))
    val mtimes =
      if (state.mtimes.isEmpty) Nil
      else List("file_mtimes" -> JObject(
        state.mtimes.toSeq.sortBy(_._1).map { case (k, v) => k -> (JInt(v): JValue) }.toList))
    val ref =
      if (state.retentionRef == Long.MinValue) Nil
      else List("retention_ref" -> (JInt(state.retentionRef): JValue))
    val payload = JObject(base ++ mtimes ++ ref)
    val path = new Path(ledgerPath)
    val fs: FileSystem = path.getFileSystem(conf)
    val out = fs.create(path, true)
    try out.write(JsonMethods.pretty(JsonMethods.render(payload)).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Persist processed IDs only (legacy surface — no retention fields). */
  def save(
      ledgerPath: String,
      ids: Set[String],
      conf: Configuration = new Configuration(),
      now: Instant = Instant.now()): Unit =
    saveState(ledgerPath, State(ids, Map.empty, Long.MinValue), conf, now)
}
