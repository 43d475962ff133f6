package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes + typed metadata — the multimodal
  * column model (image/audio/video as `binary` with a kind tag). */
case class MediaRecord(media_id: Long, kind: String, content: Array[Byte])

/** Typed features extracted from a media record. */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                         sig: String, width: Int, height: Int)

/** Typed audio metadata: real for WAV/AIFF/AU payloads (header-only
  * `javax.sound.sampled` read), deterministic stub otherwise. */
case class AudioFeatures(media_id: Long, n_bytes: Int, sample_rate: Int,
                         channels: Int, n_frames: Long, duration_ms: Long)

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns and run decode / feature-extraction /
  * frame-sampling as batched per-partition passes over a typed
  * `Dataset` — the Scala analogue of a Pandas-UDF `mapInPandas` stage
  * (per-partition batching, columnar in, typed struct out).
  *
  * Image payloads are decoded FOR REAL: a magic-byte sniff routes
  * PNG/JPEG/GIF/BMP payloads to `javax.imageio` (public JDK API, zero
  * extra deps) — dimensions come from a header-only read
  * ([[decodeDims]], no pixel decode: the scalable path for
  * metadata extraction over media at corpus scale), and
  * [[resizeImages]] does a full decode → resample → re-encode.
  * Non-image payloads (audio/video/the text-derived test corpus, whose
  * codecs this container lacks) fall back to the deterministic
  * [[decodeStub]], which keeps the end-to-end oracles SQL-replayable. */
object Multimodal {

  /** Synthesize a media table from the documents table: text bytes as
    * the opaque payload (deterministic stand-in for real image bytes). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"), lit("image").as("kind"),
      col("text").cast("binary").as("content"))

  /** STUB decoder: deterministic fake "decode" of a payload no real
    * codec claims (audio/video in this container, or arbitrary bytes).
    * The formulas are chosen to be replicable in SQL so the plumbing
    * stays oracle-checkable end to end. */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val n = bytes.length
    (n % 64 + 1, n % 48 + 1) // fake (width, height)
  }

  /** Magic-byte sniff for the formats `javax.imageio` ships decoders
    * for. A few byte compares per record — negligible next to the md5
    * the feature pass already computes. */
  def sniffImageFormat(bytes: Array[Byte]): Option[String] = {
    @inline def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    // BMP's 2-byte "BM" magic is weak — any text starting "BM" would
    // match, and the JDK BMP reader reads width/height out of whatever
    // follows with little validation (silent garbage dimensions). So
    // require a plausible header too: enough bytes for the DIB
    // header-size field, and that field holding one of the real DIB
    // header sizes (BITMAPCOREHEADER 12, BITMAPINFOHEADER 40, V4 108,
    // V5 124 — little-endian u32 at offset 14).
    def bmpHeaderPlausible: Boolean = {
      if (bytes.length < 26) false
      else {
        val dibSize = at(14) | (at(15) << 8) | (at(16) << 16) | (at(17) << 24)
        dibSize == 12 || dibSize == 40 || dibSize == 108 || dibSize == 124
      }
    }
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') Some("png")
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) Some("jpeg")
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') Some("gif")
    else if (at(0) == 'B' && at(1) == 'M' && bmpHeaderPlausible) Some("bmp")
    else None
  }

  /** REAL image dimensions via a header-only `javax.imageio` read —
    * `ImageReader.getWidth/getHeight` parse the format header without
    * decoding pixels, so a 20 MB JPEG costs a few hundred bytes of
    * work: the shape that survives metadata extraction over 100 TB of
    * media. Payloads that don't sniff as an image (or whose header is
    * corrupt) fall back to [[decodeStub]]. */
  def decodeDims(bytes: Array[Byte]): (Int, Int) =
    sniffImageFormat(bytes).flatMap { _ =>
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers.hasNext) {
            val r = readers.next()
            try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
            finally r.dispose()
          } else None
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }.getOrElse(decodeStub(bytes))

  /** Magic-byte sniff for the audio container formats the JDK ships
    * readers for: WAV (RIFF….WAVE), AIFF (FORM….AIFF), AU (.snd). */
  def sniffAudioFormat(bytes: Array[Byte]): Option[String] = {
    @inline def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    def tag(off: Int, s: String): Boolean =
      s.zipWithIndex.forall { case (ch, i) => at(off + i) == ch.toInt }
    if (tag(0, "RIFF") && tag(8, "WAVE")) Some("wav")
    else if (tag(0, "FORM") && (tag(8, "AIFF") || tag(8, "AIFC"))) Some("aiff")
    else if (tag(0, ".snd")) Some("au")
    else None
  }

  /** STUB audio metadata for payloads no JDK reader claims —
    * deterministic from the byte length, SQL-replayable like
    * [[decodeStub]]. */
  def audioStub(bytes: Array[Byte]): (Int, Int, Long) = {
    val n = bytes.length
    (n % 40000 + 8000, n % 2 + 1, n.toLong % 1000 + 1) // (rate, channels, frames)
  }

  /** REAL audio metadata via a header-only `javax.sound.sampled` read
    * (`AudioSystem.getAudioFileFormat` parses the container header
    * without decoding samples — the 100 TB-safe shape, like the image
    * path's dimension read). Non-audio or corrupt payloads fall back
    * to [[audioStub]]. Returns (sampleRate, channels, frames). */
  def audioMeta(bytes: Array[Byte]): (Int, Int, Long) =
    sniffAudioFormat(bytes).flatMap { _ =>
      try {
        val f = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = f.getFormat
        // AudioSystem.NOT_SPECIFIED (-1) is a legal return for frame
        // length / sample rate / channels on streamable formats; passing
        // it through would emit n_frames = -1 and a negative duration.
        // Treat an unspecified field as a failed parse → stub fallback.
        val rate = fmt.getSampleRate.toInt
        val ch = fmt.getChannels
        val frames = f.getFrameLength.toLong
        if (rate <= 0 || ch <= 0 || frames < 0) None
        else Some((rate, ch, frames))
      } catch { case scala.util.control.NonFatal(_) => None }
    }.getOrElse(audioStub(bytes))

  /** Batched per-partition audio metadata extraction — same
    * mapPartitions shape as [[extractFeatures]]. duration_ms derives
    * from frames/rate (floored; stub values divide cleanly). */
  def extractAudioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (rate, ch, frames) = audioMeta(m.content)
        AudioFeatures(m.media_id, m.content.length, rate, ch, frames,
          frames * 1000L / math.max(rate, 1))
      }
    }
  }

  /** Batched per-partition feature extraction over the typed Dataset —
    * the mapInPandas-shaped stage. md5 via MessageDigest per record
    * (cheap vs a real decode; a production decoder would amortize setup
    * per partition, which is exactly what mapPartitions provides). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup happens once (decoder init goes here)
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val (w, h) = decodeDims(m.content)
        digest.reset()
        val sig = digest.digest(m.content).map("%02x".format(_)).mkString
        MediaFeatures(m.media_id, m.kind, m.content.length, sig, w, h)
      }
    }
  }

  /** Frame sampling: slice `frameSize`-byte pseudo-frames at a stride —
    * the video-frame-sample plumbing (binary slicing + posexplode),
    * fully columnar. */
  def sampleFrames(media: DataFrame, frameSize: Int, stride: Int): DataFrame =
    media
      .select(col("media_id"), col("content"),
        explode(sequence(lit(1),
          greatest(length(col("content")) - (frameSize - 1), lit(1)),
          lit(stride))).as("offset"))
      .select(col("media_id"), col("offset"),
        col("content").substr(col("offset"), lit(frameSize)).as("frame"))

  /** Every `factor`-th byte of a payload, as binary — a native O(n)
    * expression (graft.functions.StrideBytes). The previous
    * Column-composition form (aggregate + binary concat fold) copied
    * the accumulator every step: O(len²/factor) bytes per row, a
    * scale-killer on megabyte media payloads. Byte-exact for arbitrary
    * (non-UTF8) content; an empty payload yields an empty payload. */
  def strideBytes(c: org.apache.spark.sql.Column, factor: Int): org.apache.spark.sql.Column =
    graft.functions.StrideBytes.strideBytes(c, factor)

  /** Byte-stride "resize" of an opaque payload — the deterministic,
    * SQL-replayable downsample for payloads with no image codec; keeps
    * (media_id, resized content + its size) with the original
    * untouched. For genuine image payloads use [[resizeImages]]. */
  def resize(media: DataFrame, factor: Int): DataFrame =
    media.select(col("media_id"),
      strideBytes(col("content"), factor).as("content_small"))
      .withColumn("n_bytes_small", length(col("content_small")).cast("long"))

  /** REAL image resample: decode → bilinear scale by 1/factor (floored,
    * min 1 px) → re-encode as PNG, batched per partition so codec
    * setup amortizes. Payloads that don't sniff/decode as an image
    * fall back to the byte-stride downsample, so a mixed corpus flows
    * through one operator. */
  def resizeImages(media: Dataset[MediaRecord], factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val resized: Array[Byte] = sniffImageFormat(m.content).flatMap { _ =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(m.content))
            Option(img).map { src =>
              val w = math.max(1, src.getWidth / factor)
              val h = math.max(1, src.getHeight / factor)
              val dst = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(src, 0, 0, w, h, null)
              } finally g.dispose()
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", out)
              out.toByteArray
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        }.getOrElse {
          val n = m.content.length
          Array.tabulate((n + factor - 1) / factor)(i => m.content(i * factor))
        }
        (m.media_id, resized, resized.length.toLong)
      }
    }.toDF("media_id", "content_small", "n_bytes_small")
  }

  /** End-to-end pipeline DataFrame for the query surface. */
  def featuresFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(docs).as[MediaRecord]).toDF()
  }
}
