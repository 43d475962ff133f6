package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes + typed metadata — the multimodal
  * column model (image/audio/video as `binary` with a kind tag). */
case class MediaRecord(media_id: Long, kind: String, content: Array[Byte])

/** Typed features extracted from a media record. */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                         sig: String, width: Int, height: Int)

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns and run decode / feature-extraction /
  * frame-sampling as batched per-partition passes over a typed
  * `Dataset` — the Scala analogue of a Pandas-UDF `mapInPandas` stage
  * (per-partition batching, columnar in, typed struct out).
  *
  * The actual codec call is STUBBED (no image/audio libraries in this
  * container): [[decodeStub]] produces deterministic fake dimensions
  * from the byte content. The Spark-side contract — schema, typed
  * Encoder, partition-batched execution, binary column handling — is
  * real and tested; swap `decodeStub` for a JNI/library decoder to go
  * live. */
object Multimodal {

  /** Synthesize a media table from the documents table: text bytes as
    * the opaque payload (deterministic stand-in for real image bytes). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"), lit("image").as("kind"),
      col("text").cast("binary").as("content"))

  /** STUB decoder: deterministic fake "decode" of an image payload.
    * Real implementation would hand `bytes` to an image codec; the
    * formulas below are chosen to be replicable in SQL so the plumbing
    * is oracle-checkable end to end. */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val n = bytes.length
    (n % 64 + 1, n % 48 + 1) // fake (width, height)
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
        val (w, h) = decodeStub(m.content)
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

  /** STUB resize: deterministic stride-downsample of the payload
    * standing in for a real image resample (the decode/resample codec
    * is the swap-in point); keeps (media_id, resized content + its
    * size) with the original untouched. */
  def resize(media: DataFrame, factor: Int): DataFrame =
    media.select(col("media_id"),
      strideBytes(col("content"), factor).as("content_small"))
      .withColumn("n_bytes_small", length(col("content_small")).cast("long"))

  /** End-to-end pipeline DataFrame for the query surface. */
  def featuresFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(docs).as[MediaRecord]).toDF()
  }
}
