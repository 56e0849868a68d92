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
  * Decode is real and dependency-free: [[decodeMeta]] reads image
  * dimensions via the JDK's ImageIO (header-only — no pixel decode) and
  * audio sample rates via javax.sound.sampled, falling back to a
  * deterministic synthetic header for payloads no codec recognizes so
  * the operators stay total over a dirty corpus. [[resize]] does a real
  * bilinear downscale + PNG re-encode for decodable images.
  */
object Multimodal {

  /** A media row: opaque payload + modality tag. */
  final case class MediaItem(id: Long, modality: String, content: Array[Byte])

  /** Typed metadata the (stubbed) decoder yields. */
  final case class MediaMeta(id: Long, modality: String, nBytes: Long,
      width: Int, height: Int, sampleRate: Int)

  /** Per-item fixed-width feature vector (16-bin byte histogram, L1-normalized). */
  final case class MediaFeatures(id: Long, features: Array[Float])

  /** Real media header decode, zero extra dependencies:
    *
    *   - images (PNG/JPEG/GIF/BMP — whatever the JDK's ImageIO registry
    *     knows): width/height come from `ImageReader.getWidth/getHeight`,
    *     which parse the CONTAINER HEADER only — no pixel decode, so the
    *     per-row cost is O(header), not O(pixels), exactly what a
    *     100 TB metadata pass wants;
    *   - audio (WAV/AIFF/AU via `javax.sound.sampled`): sample rate from
    *     `AudioSystem.getAudioFileFormat`, again header-only;
    *   - anything neither stack recognizes falls back to the original
    *     deterministic synthetic header (first bytes → width/height,
    *     length → sampleRate), keeping the function TOTAL over arbitrary
    *     payloads — a dirty 100 TB corpus must never kill the job on one
    *     truncated file.
    *
    * `ImageIO.setUseCache(false)` keeps the readers off executor-local
    * temp files: payloads are already in memory, spilling them back to
    * disk per row would be an I/O storm.
    */
  def decodeMeta(item: MediaItem): MediaMeta = {
    val b = item.content
    imageSize(b) match {
      case Some((w, h)) =>
        MediaMeta(item.id, item.modality, b.length.toLong, w, h, 0)
      case None =>
        audioSampleRate(b) match {
          case Some(sr) => MediaMeta(item.id, item.modality, b.length.toLong, 0, 0, sr)
          case None     => syntheticMeta(item)
        }
    }
  }

  /** Header-only image dimensions via the JDK ImageIO registry; None if no
    * installed reader claims the payload or the header is corrupt.
    */
  private[graft] def imageSize(b: Array[Byte]): Option[(Int, Int)] =
    // one catch-all around the WHOLE codec interaction: reader SPIs'
    // canDecodeInput / header parsing are known to throw unchecked
    // exceptions (not just IOException) on crafted or bit-rotted bytes,
    // and even close() can propagate — none of that may kill a job
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO
        .createImageInputStream(new java.io.ByteArrayInputStream(b))
      if (iis == null) None
      else try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            Some((r.getWidth(0), r.getHeight(0)))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Header-only audio sample rate via javax.sound.sampled; None for
    * non-audio payloads.
    */
  private[ops] def audioSampleRate(b: Array[Byte]): Option[Int] =
    try {
      val fmt = javax.sound.sampled.AudioSystem
        .getAudioFileFormat(new java.io.ByteArrayInputStream(b))
      Some(fmt.getFormat.getSampleRate.toInt)
    } catch { case _: Exception => None }

  /** The deterministic synthetic header for payloads no codec recognizes
    * (and the previous stub's contract, kept so opaque-blob tables — e.g.
    * the documents-as-bytes fixture — still yield stable metadata).
    */
  private[ops] def syntheticMeta(item: MediaItem): MediaMeta = {
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

  /** Payload down-scale, where the bytes sit (`mapPartitions`):
    * decodable images get a REAL bilinear resample (ImageIO decode →
    * Graphics2D scale by 1/factor → PNG re-encode, all JDK-built-in);
    * opaque payloads fall back to deterministic byte decimation (keep
    * every `factor`-th byte) so the operator stays total.
    */
  def resize(items: Dataset[MediaItem], factor: Int = 4): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map { it =>
      val out = resizeImage(it.content, factor).getOrElse {
        val src = it.content
        val dec = new Array[Byte]((src.length + factor - 1) / factor)
        var i = 0
        while (i < dec.length) { dec(i) = src(i * factor); i += 1 }
        dec
      }
      MediaItem(it.id, it.modality, out)
    })
  }

  /** Bilinear image downscale by 1/`factor`, re-encoded as PNG; None if
    * the payload doesn't decode as an image.
    */
  private[ops] def resizeImage(b: Array[Byte], factor: Int): Option[Array[Byte]] = {
    javax.imageio.ImageIO.setUseCache(false)
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) None
      else {
        val w = math.max(1, img.getWidth / factor)
        val h = math.max(1, img.getHeight / factor)
        val scaled = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = scaled.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(scaled, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }
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
