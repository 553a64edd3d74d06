package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing for training-data pipelines: image/audio/video
 * payloads ride as opaque BINARY columns with a typed metadata struct; the
 * Spark-side schema / partitioning / batch shape is real and tested.
 * Raster images (PNG/JPEG/BMP/GIF via javax.imageio) and PCM audio
 * (WAV/AIFF/AU via javax.sound.sampled) decode AND resize for REAL with
 * the JDK's own codecs; only video keeps a clearly-marked deterministic
 * STUB (no video codec ships with the JDK — at deploy time the stub body
 * is replaced by a real decoder with the same signature).
 *
 * Batch shape: decode/feature-extract run as typed mapPartitions over
 * Iterator[Row] — per-partition batching, constant memory, the Scala
 * analogue of mapInPandas batches. Payload columns stay out of shuffle keys;
 * repartition before decode is by (asset id) only.
 */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Wrap a documents-like table into the media shape: payload = utf8 bytes
    * of the text (the deterministic stand-in for real image/audio bytes). */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("asset_id"),
      concat(lit("application/x-fake-"),
        substring(md5(col(textCol)), 1, 4)).as("mime"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB media decode: derives deterministic pseudo-metadata (width/height/
    * frames/duration) from the payload bytes. Replace with a real decoder
    * (same signature) in production; everything downstream is unchanged. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Double) = {
    // ??? <- real decoder goes here; deterministic fake below
    val n = payload.length
    val w = 16 + (n % 1024)
    val h = 16 + ((n / 7) % 1024)
    val frames = 1 + n / 1000
    (w, h, frames, frames / 30.0)
  }

  /** REAL raster decode via javax.imageio (the JDK ships PNG/JPEG/BMP/GIF
    * readers, so image decode needs no external media library): width and
    * height come from the decoded image, frames=1, duration 0. */
  def decodeImage(payload: Array[Byte]): (Int, Int, Int, Double) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable raster image")
    (img.getWidth, img.getHeight, 1, 0.0)
  }

  /** REAL audio decode via javax.sound.sampled (the JDK ships WAV/AIFF/AU
    * readers): metadata mapping is (width = sample rate, height = channel
    * count, n_frames = PCM frame count, duration_s = frames / frame rate). */
  def decodeAudio(payload: Array[Byte]): (Int, Int, Int, Double) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      val frames = in.getFrameLength
      (fmt.getSampleRate.toInt, fmt.getChannels, frames.toInt,
        frames / fmt.getFrameRate.toDouble)
    } finally in.close()
  }

  /** MIME routing: raster images and PCM audio decode for real via the
    * JDK codecs; MP4 and Matroska/WebM video gets REAL container-level
    * metadata (width/height/frames/duration from the box/EBML structure,
    * [[MediaContainers]]) with only the frame pixels stubbed; other video
    * containers keep the deterministic stub. */
  def decodeMedia(mime: String, payload: Array[Byte]): (Int, Int, Int, Double) =
    if (mime.startsWith("image/")) decodeImage(payload)
    else if (mime.startsWith("audio/")) decodeAudio(payload)
    else if (mime == "video/mp4" || mime == "video/quicktime")
      MediaContainers.decodeMp4(payload)
    else if (mime == "video/x-matroska" || mime == "video/webm")
      MediaContainers.decodeMkv(payload)
    else decodeStub(payload)

  /** Deterministic WAV synthesis: `frames` mono 16-bit PCM samples at
    * `rate` Hz, sample i = pure function of (seed, i). The test payload
    * generator for the real audio-decode path. */
  def synthWav(seed: Long, frames: Int, rate: Float = 8000f): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val data = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = (((seed * 31 + i.toLong * 7) % 65536) - 32768).toShort
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic PNG synthesis: a w×h RGB raster whose pixels are a pure
    * function of (seed, x, y), encoded by the JDK's PNG writer. The test
    * payload generator for the real-decode path. */
  def synthPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((x * 31 + y * 7 + seed) % 0x1000000) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode metadata for every asset (mapPartitions batch shape); raster
    * mime types go through the real javax.imageio decoder. */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.filterNot(_.name == "payload") ++ Seq(
      StructField("n_bytes", IntegerType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("n_frames", IntegerType),
      StructField("duration_s", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    val mimeIdx = media.schema.fieldIndex("mime")
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, f, d) = decodeMedia(r.getString(mimeIdx), payload)
        val passThrough = r.toSeq.zipWithIndex.collect { case (v, i) if i != payloadIdx => v }
        Row.fromSeq(passThrough ++ Seq[Any](payload.length, w, h, f, d))
      }
    }(enc)
  }

  /** STUB frame sampler: every `stride`-th frame index up to n_frames —
    * the plumbing (explode to one row per sampled frame) is real. */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.select(col("asset_id"), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** STUB resize: deterministic byte-domain downsample standing in for an
    * image resize — output payload is every `factor`-th byte, metadata
    * dims scale accordingly. Real resampling drops in with the same
    * (binary, Int) => binary signature; the schema/batch plumbing (binary
    * in, binary out, metadata recomputed downstream) is the real part. */
  def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] = {
    // ??? <- real image resize goes here; deterministic fake below
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** REAL image resize: decode, nearest-neighbor scale to
    * (max(1, w/factor), max(1, h/factor)), re-encode PNG — deterministic
    * pixel arithmetic via Graphics2D with NEAREST_NEIGHBOUR interpolation. */
  def resizeImage(payload: Array[Byte], factor: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable raster image")
    val w2 = math.max(1, img.getWidth / factor)
    val h2 = math.max(1, img.getHeight / factor)
    val out = new java.awt.image.BufferedImage(w2, h2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
    g.drawImage(img, 0, 0, w2, h2, null)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Resize every asset's payload (mapPartitions batch shape); raster
    * mimes go through the REAL decode-scale-reencode path, others keep
    * the byte-domain stub. Downstream decodeMeta over the result reflects
    * the true scaled dimensions. */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("asset_id"), col("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, mime, p) =>
        val out = if (mime.startsWith("image/")) resizeImage(p, factor)
                  else resizeStub(p, factor)
        (id, mime, out)
      })
      .toDF("asset_id", "mime", "payload")
  }

  /** STUB feature extraction: fixed-width feature vector per asset derived
    * from payload bytes (deterministic); real model inference drops in with
    * the same (binary) => Array[Float] signature. */
  def featureStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  def extractFeatures(media: DataFrame, dim: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, featureStub(p, dim)) })
      .toDF("asset_id", "features")
  }
}
