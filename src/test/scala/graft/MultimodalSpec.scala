package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaItem

/** Multimodal binary-column plumbing: typed Dataset round-trip, real
  * JDK-codec decode (ImageIO headers, WAV sample rates) with its
  * deterministic synthetic fallback, real byte-histogram features
  * (checked against an independent SQL computation), real image resize,
  * and frame sampling shape.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("media table from documents: binary schema, typed round-trip") {
    val items = Multimodal.mediaFromDocuments(spark, sf)
    assert(items.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val first = items.orderBy("id").head()
    assert(first.modality.startsWith("img_"))
    assert(first.content.length >= 0)
  }

  /** Tiny real image, encoded with the JDK itself — no fixtures on disk. */
  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Minimal mono 16-bit WAV at the given sample rate. */
  private def wavBytes(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](nSamples * 2)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeMeta reads real PNG/JPEG headers and WAV sample rates") {
    val png = Multimodal.decodeMeta(MediaItem(1L, "img", imageBytes(37, 21, "png")))
    assert(png.width == 37 && png.height == 21, s"png decoded as $png")
    val jpg = Multimodal.decodeMeta(MediaItem(2L, "img", imageBytes(64, 48, "jpg")))
    assert(jpg.width == 64 && jpg.height == 48, s"jpeg decoded as $jpg")
    val wav = Multimodal.decodeMeta(MediaItem(3L, "aud", wavBytes(22050, 100)))
    assert(wav.sampleRate == 22050 && wav.width == 0, s"wav decoded as $wav")
  }

  test("real decode runs distributed through extractMeta") {
    val items = Seq(
      MediaItem(1L, "img", imageBytes(16, 8, "png")),
      MediaItem(2L, "aud", wavBytes(8000, 10)),
      MediaItem(3L, "txt", "not an image".getBytes("UTF-8"))).toDS()
    val meta = Multimodal.extractMeta(items).collect().map(m => m.id -> m).toMap
    assert(meta(1L).width == 16 && meta(1L).height == 8)
    assert(meta(2L).sampleRate == 8000)
    assert(meta(3L).width > 0, "opaque payload lost its synthetic fallback")
  }

  test("resize does a real downscale on decodable images") {
    val items = Seq(MediaItem(1L, "img", imageBytes(40, 24, "png"))).toDS()
    val out = Multimodal.resize(items, factor = 4).collect().head
    val dims = Multimodal.imageSize(out.content)
    assert(dims.contains((10, 6)), s"resized dims $dims, expected (10,6)")
  }

  test("synthetic fallback is deterministic and total on empty payloads") {
    val a = Multimodal.decodeMeta(MediaItem(1L, "img", Array[Byte](130.toByte, 7, 9)))
    val b = Multimodal.decodeMeta(MediaItem(1L, "img", Array[Byte](130.toByte, 7, 9)))
    assert(a == b)
    assert(a.width == 1 + (130 % 64) && a.height == 1 + 7 % 64)
    val empty = Multimodal.decodeMeta(MediaItem(2L, "img", Array.empty))
    assert(empty.nBytes == 0L && empty.width == 1 && empty.height == 1)
  }

  test("extractMeta runs distributed and matches decodeMeta per row") {
    val items = Multimodal.mediaFromDocuments(spark, sf)
    val meta = Multimodal.extractMeta(items).collect().map(m => m.id -> m).toMap
    val local = items.collect()
    assert(meta.size == local.length)
    for (it <- local.take(20)) assert(meta(it.id) == Multimodal.decodeMeta(it))
  }

  test("byteHistogram matches an independent SQL histogram and is L1-normalized") {
    val items = Multimodal.mediaFromDocuments(spark, sf).limit(50)
    val feats = Multimodal.byteHistogram(items).collect().map(f => f.id -> f.features).toMap
    // independent computation: explode text chars -> ascii -> high nibble
    val sql = items.toDF()
      .select(col("id"), explode(split(decode(col("content"), "UTF-8"), "")).as("ch"))
      .filter(length(col("ch")) === 1)
      .select(col("id"), (ascii(col("ch")) / 16).cast("int").as("bin"))
      .groupBy("id", "bin").count()
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getInt(1) -> r.getLong(2)).toMap).toMap
    for ((id, f) <- feats) {
      assert(f.length == 16)
      val total = f.sum
      assert(total == 0f || math.abs(total - 1f) < 1e-3, s"not normalized: $total")
      val expected = sql.getOrElse(id, Map.empty)
      val n = expected.values.sum.toFloat
      for ((bin, cnt) <- expected)
        assert(math.abs(f(bin) - cnt / n) < 1e-3, s"id=$id bin=$bin")
    }
  }

  test("resize falls back to byte decimation on opaque payloads") {
    import spark.implicits._
    val items = Seq(
      Multimodal.MediaItem(1L, "img", Array.tabulate[Byte](10)(_.toByte)),
      Multimodal.MediaItem(2L, "img", Array.empty[Byte])).toDS()
    val out = Multimodal.resize(items, factor = 4).collect().sortBy(_.id)
    assert(out(0).content.toSeq == Seq[Byte](0, 4, 8))
    assert(out(1).content.isEmpty)
  }

  /** A deterministic "photo": smooth 2-D gradient plus a diagonal edge —
    * enough luma structure that dHash bits are meaningful (a flat image
    * hashes to 0 everywhere and everything "matches").
    */
  private def photoBytes(shift: Int = 0, rotate: Boolean = false): Array[Byte] = {
    val (w, h) = (64, 48)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val (sx, sy) = if (rotate) (y * w / h, (w - 1 - x) * h / w) else (x, y)
      val base = (sx * 2 + sy * 3 + (if ((sx + sy) % 17 < 8) 40 else 0)) % 200
      val v = math.min(250, base + shift)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash: planted brightness-shifted near-dup found; rotation and noise rejected") {
    val noise = {
      // deterministic LCG noise — nothing like the photo's gradients
      var s = 12345L
      val img = new java.awt.image.BufferedImage(
        64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 48) {
        s = s * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((s >>> 40) & 0xffffff).toInt)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val items = Seq(
      MediaItem(1L, "img", photoBytes()),
      MediaItem(2L, "img", photoBytes(shift = 3)), // near-dup of 1
      MediaItem(3L, "img", photoBytes(rotate = true)), // same pixels, rotated
      MediaItem(4L, "img", noise)).toDS()
    val pairs = Multimodal.imageNearDupPairs(items)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"rotation matched: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"noise matched: $pairs")
  }

  test("dHash: brightness shift preserves the hash exactly (gradients unchanged)") {
    val a = Multimodal.dHash64(photoBytes())
    val b = Multimodal.dHash64(photoBytes(shift = 3))
    assert(java.lang.Long.bitCount(a ^ b) <= 3, s"hamming ${java.lang.Long.bitCount(a ^ b)}")
    assert(a != 0L, "hash degenerated to 0 — the fixture lost its luma structure")
  }

  test("dHash byte fallback matches an independent reference implementation") {
    val payload = "the quick brown fox jumps over the lazy dog, twice over".getBytes("UTF-8")
    def refGrid(i: Int): Int = payload((i.toLong * payload.length / 72).toInt) & 0xff
    var want = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (refGrid(r * 9 + c + 1) > refGrid(r * 9 + c)) want |= 1L << (r * 8 + c)
    assert(Multimodal.dHash64(payload) === want)
    assert(Multimodal.dHash64(Array.empty[Byte]) === 0L)
    assert(Multimodal.dHash64(null) === 0L)
  }

  test("banding is lossless to hamming 3: pairs equal brute-force with planted dups") {
    // real corpus payloads as distractors (ids shifted out of the probe
    // slice) + planted byte-payload dups inside it: the sf0.001 corpus
    // alone yields no byte-grid pairs within hamming 3, which would make
    // the equality vacuous
    val real = Multimodal.mediaFromDocuments(spark, sf)
      .collect().map(it => MediaItem(it.id + 1000L, it.modality, it.content))
    val base = "a quick brown fox jumps over the lazy dog and then naps".getBytes("UTF-8")
    val tweaked = base.clone(); tweaked(10) = 'z'.toByte
    val planted = Seq(
      MediaItem(0L, "img", base),
      MediaItem(1L, "img", base.clone()), // exact dup: hamming 0
      MediaItem(2L, "img", tweaked))      // one byte off: a few bits at most
    val items = (planted ++ real).toDS()
    val got = Multimodal.imageNearDupPairs(items)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = Multimodal.dHashes(items).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val want = (for {
      (ia, ha) <- hashes if ia < 100L
      (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got === want)
    assert(want.contains((0L, 1L, 0L)), s"planted exact dup missed: $want")
  }

  /** Canonical 44-byte-header mono 16-bit PCM WAV around `samples`. */
  private def wavBytes(samples: Array[Int], rate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(rate); bb.putInt(rate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  /** Deterministic test signal: constant |amplitude| per 1/72 time cell
    * (levels well separated between adjacent cells), alternating sign —
    * cell energy sums are exact integers the fingerprint compares.
    */
  private def signal(n: Int, mult: Int = 1, perm: Int = 37): Array[Int] =
    Array.tabulate(n) { j =>
      val cell = (j.toLong * 72 / n).toInt
      val lvl = (100 + ((cell * perm + 7) % 53) * 30) * mult
      if (j % 2 == 0) lvl else -lvl
    }

  test("audio fingerprint: real PCM path decodes; gain shift preserves the hash EXACTLY") {
    val base = wavBytes(signal(7200))
    assert(Multimodal.pcmSamples(base).exists(_.length == 7200),
      "WAV payload must take the real PCM path, not the byte fallback")
    val gained = wavBytes(signal(7200, mult = 2))
    val (ha, hg) = (Multimodal.audioHash64(base), Multimodal.audioHash64(gained))
    assert(ha === hg, "exact gain invariance: every cell sum scales by exactly 2")
    assert(ha != 0L, "hash degenerated to 0 — the fixture lost its energy structure")
  }

  test("audio near-dup: resampled copy found, different content rejected") {
    val base = signal(7200)
    val resampled = Array.tabulate(3600)(i => base(2 * i)) // 2x decimation
    val items = Seq(
      MediaItem(1L, "aud", wavBytes(base)),
      MediaItem(2L, "aud", wavBytes(resampled, rate = 4000)),
      MediaItem(3L, "aud", wavBytes(signal(7200, perm = 41))), // different content
      MediaItem(4L, "aud", wavBytes(signal(7200, mult = 3)))   // gain twin of 1
    ).toDS()
    val pairs = Multimodal.audioNearDupPairs(items)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"resampled near-dup missed: $pairs")
    assert(pairs.contains((1L, 4L)), s"gain-shifted copy missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"different-content signal matched: $pairs")
  }

  test("audio fingerprint byte fallback matches an independent reference implementation") {
    val payload = "the quick brown fox jumps over the lazy dog, twice over".getBytes("UTF-8")
    def refCell(i: Int): Long = {
      val lo = (i.toLong * payload.length / 72).toInt
      val hi = ((i + 1).toLong * payload.length / 72).toInt
      (lo until hi).map(j => (payload(j) & 0xff).toLong).sum
    }
    var want = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (refCell(r * 9 + c + 1) > refCell(r * 9 + c)) want |= 1L << (r * 8 + c)
    assert(Multimodal.audioHash64(payload) === want)
    assert(Multimodal.audioHash64(Array.empty[Byte]) === 0L)
    assert(Multimodal.audioHash64(null) === 0L)
    // the fallback is the SUM grid, not dHash's point-sample grid: the
    // two fingerprints genuinely differ on the same opaque payload
    assert(Multimodal.audioHash64(payload) !== Multimodal.dHash64(payload))
  }

  test("sampleFrames keeps every stride-th fixed-size chunk") {
    val df = Seq((1L, ("x" * 5000).getBytes("UTF-8"))).toDF("id", "content")
    val frames = Multimodal.sampleFrames(df, frameBytes = 1024, stride = 2)
      .select(col("frames")).head().getSeq[Array[Byte]](0)
    // 5000 bytes -> 5 chunks (0..4), stride 2 keeps 0,2,4
    assert(frames.length == 3)
    assert(frames(0).length == 1024)
    assert(frames(2).length == 5000 - 4 * 1024, "last chunk is the remainder")
  }

  test("video frame hashes match an independent per-frame reference; cap and totality hold") {
    val rnd = new scala.util.Random(7)
    val payload = Array.fill(400)(rnd.nextInt(256).toByte)
    val got = Multimodal.videoFrameHash64(payload, 64, 16)
    assert(got.length == 7, "400 bytes at 64/frame = 7 frames (last partial)")
    // independent recompute: per-frame byte grid + gradient bits
    for (f <- 0 until 7) {
      val off = f * 64
      val flen = math.min(64, 400 - off)
      def cell(i: Int): Int = payload(off + (i.toLong * flen / 72).toInt) & 0xff
      var want = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (cell(r * 9 + c + 1) > cell(r * 9 + c)) want |= 1L << (r * 8 + c)
      assert(got(f) === want, s"frame $f hash diverged from the reference")
    }
    assert(Multimodal.videoFrameHash64(payload, 64, 3).length == 3, "maxFrames cap")
    assert(Multimodal.videoFrameHash64(Array.empty[Byte], 64, 16).isEmpty)
    assert(Multimodal.videoFrameHash64(null, 64, 16).isEmpty)
  }

  test("video near-dup: trimmed copy aligns at foffset -1; scrambled frames rejected") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(512)(rnd.nextInt(256).toByte) // 8 full frames
    // trimmed re-encode: drop frame 0, flip the new leading byte
    val trimmed = base.drop(64).clone()
    trimmed(0) = 'x'.toByte
    // same frames, shuffled order: every frame pair still matches, but
    // the matches scatter across offsets — no alignment reaches 3 votes
    val scrambled = Array.range(0, 8).map(f => (f * 3) % 8)
      .flatMap(f => base.slice(f * 64, (f + 1) * 64))
    val other = Array.fill(512)(rnd.nextInt(256).toByte)
    val items = Seq(
      Multimodal.MediaItem(1L, "vid", base),
      Multimodal.MediaItem(2L, "vid", trimmed),
      Multimodal.MediaItem(3L, "vid", other),
      Multimodal.MediaItem(4L, "vid", scrambled)
    ).toDS()
    val rows = Multimodal.videoNearDupPairs(items)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    val byPair = rows.groupBy(_._1)
    assert(byPair.contains((1L, 2L)), s"trimmed copy missed: ${rows.toSeq}")
    val (off, votes) = byPair((1L, 2L)).map(_._2).maxBy(_._2)
    assert(off === -1L, s"alignment offset wrong: ${byPair((1L, 2L)).toSeq}")
    assert(votes >= 7L, s"7 surviving frames must all vote at -1: $votes")
    assert(!byPair.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated content matched: ${rows.toSeq}")
    assert(!byPair.keySet.contains((1L, 4L)) && !byPair.keySet.contains((2L, 4L)),
      s"scrambled frame order must not align: ${rows.toSeq}")
  }

  test("video near-dup over the corpus fixture: every planted trim found at foffset -1") {
    val pairs = Multimodal.videoNearDupPairs(Multimodal.videoWithVariants(spark, sf))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("text").isNotNull && col("doc_id").isNotNull)
      .filter(col("doc_id") % 9 === 0 && length(col("text")) >= 320 &&
        col("doc_id") < 100)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty, "fixture vacuous: no plantable docs at this sf")
    planted.foreach { id =>
      assert(pairs.contains((id, id + 1000000L, -1L)),
        s"planted trim of doc $id not found at foffset -1")
    }
  }
}
