package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus distributed feature
  * extraction over the raw bytes.
  *
  * Design for 100 TB: the payload never leaves its partition — metadata
  * and features are computed where the bytes sit (codegen'd builtins for
  * the scalar stats, `mapPartitions` for the imperative extractor), and
  * only small fixed-width results shuffle. The binary column itself is a
  * normal Parquet BYTE_ARRAY: scans prune it away unless selected.
  *
  * The actual media *decode* is stubbed: this container has no
  * image/audio codecs, so [[decodeMeta]] parses a deterministic fake
  * header instead of calling a codec. Everything around it — schema,
  * typed Dataset plumbing, per-partition batching, feature shape — is
  * real and tested; swapping in a real codec changes one function body.
  */
object Multimodal {

  /** A media row: opaque payload + modality tag. */
  final case class MediaItem(id: Long, modality: String, content: Array[Byte])

  /** Typed metadata the (stubbed) decoder yields. */
  final case class MediaMeta(id: Long, modality: String, nBytes: Long,
      width: Int, height: Int, sampleRate: Int)

  /** Per-item fixed-width feature vector (16-bin byte histogram, L1-normalized). */
  final case class MediaFeatures(id: Long, features: Array[Float])

  /** STUB decoder — stands in for an image/audio codec. Deterministic
    * fake: "width"/"height" are read from the first payload bytes,
    * "sampleRate" from the byte count. A real implementation would parse
    * the container format here; the signature and call sites would not
    * change.
    */
  def decodeMeta(item: MediaItem): MediaMeta = {
    val b = item.content
    def at(i: Int): Int = if (b.length > i) b(i) & 0xff else 0
    MediaMeta(
      id = item.id,
      modality = item.modality,
      nBytes = b.length.toLong,
      width = 1 + at(0) % 64,
      height = 1 + at(1) % 64,
      sampleRate = 8000 + (b.length % 8) * 1000)
  }

  /** Decode metadata for a whole table — one pass, no shuffle: the
    * decoder runs inside each input partition (`mapPartitions`), the
    * Spark-idiomatic shape for per-row imperative work over binary
    * payloads (the Scala analogue of `mapInPandas` batch processing).
    */
  def extractMeta(items: Dataset[MediaItem]): Dataset[MediaMeta] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map(decodeMeta))
  }

  /** 16-bin byte histogram, L1-normalized — a real (non-stub) feature
    * extractor: each partition iterates its payloads once and emits a
    * fixed 16-float vector per item.
    */
  def byteHistogram(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map { it =>
      val bins = new Array[Long](16)
      var i = 0
      while (i < it.content.length) {
        bins((it.content(i) & 0xff) >> 4) += 1
        i += 1
      }
      val total = math.max(1L, it.content.length.toLong).toFloat
      MediaFeatures(it.id, bins.map(_ / total))
    })
  }

  /** STUB resize — stands in for an image down-scale: deterministically
    * keep every `factor`-th payload byte (a real codec would decode,
    * bilinear-resample, re-encode; signature and plumbing identical).
    * Runs where the bytes sit (`mapPartitions`), emits the smaller
    * payload with the applied factor.
    */
  def resize(items: Dataset[MediaItem], factor: Int = 4): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map { it =>
      val src = it.content
      val out = new Array[Byte]((src.length + factor - 1) / factor)
      var i = 0
      while (i < out.length) { out(i) = src(i * factor); i += 1 }
      MediaItem(it.id, it.modality, out)
    })
  }

  /** Frame sampling: split the payload into fixed `frameBytes` chunks and
    * keep every `stride`-th one — pure builtins (`sequence` + binary
    * `substring`), no data leaves the row.
    */
  def sampleFrames(df: DataFrame, contentCol: String = "content",
      frameBytes: Int = 1024, stride: Int = 10): DataFrame =
    df.withColumn(
      "frames",
      expr(
        s"""transform(
           |  filter(sequence(0, greatest(int(ceil(octet_length($contentCol) / $frameBytes.0)) - 1, 0)),
           |         f -> f % $stride = 0),
           |  f -> substring($contentCol, f * $frameBytes + 1, $frameBytes))""".stripMargin))

  /** Synthesize a media table from the driver's documents parquet: the
    * UTF-8 text bytes stand in for an opaque payload. Used by specs and
    * the q34 oracle query so the binary plumbing runs against real
    * distributed data.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("id"),
        concat(lit("img_"), col("source")).as("modality"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaItem]
  }

  /** Binary-column metadata as a plain DataFrame query (oracle-checkable):
    * byte length, first-8-bytes hex, and content digest, computed with
    * codegen'd builtins straight off the binary column.
    */
  def binaryMeta(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
      .select(
        col("doc_id"),
        octet_length(col("content")).cast("long").as("n_bytes"),
        substring(hex(col("content")), 1, 16).as("head_hex"),
        md5(col("content")).as("content_md5"))
      .orderBy("doc_id")

  /** DuckDB SQL replicating [[binaryMeta]]. DuckDB lacks md5(BLOB) and
    * substring(BLOB), so the digest uses the VARCHAR (same UTF-8 bytes)
    * and the head slices the hex string.
    */
  def binaryMetaOracleSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  substr(hex(encode(text)), 1, 16) AS head_hex,
      |  md5(text) AS content_md5
      |FROM documents ORDER BY doc_id""".stripMargin
}
