package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages as one `mapPartitions` pass (per-partition
  * codec setup, single decode per asset).
  *
  * Decode status by modality:
  *  - image: REAL — payloads are PNG bytes, decoded with the JDK's
  *    `javax.imageio` (no external libs needed);
  *  - audio: REAL — payloads are RIFF/WAVE PCM-16LE, parsed directly;
  *  - video: STUB — no video codec exists in a bare JDK, so
  *    `fakeVideoDecode` derives deterministic features from the bytes;
  *    the schema, batching and frame-sampling plumbing are the
  *    production ones. Swap in a real codec (javacpp/ffmpeg) at
  *    deployment; nothing else changes.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      mime: String,
      width: Int,
      height: Int,
      duration_ms: Long,
      payload: Array[Byte]
  )

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      // 8 per-asset features (decoded pixel/sample statistics for
      // image/audio; deterministic stub values for video)
      features: Array[Float],
      // frame sampling: frame offsets actually selected
      sampled_frames: Array[Long]
  )

  private def mix64(x: Long): Long = graft.pipeline.Corpus.mix64(x)

  /** Deterministic 16x16 PNG (real, ImageIO-encoded). */
  private[ops] def pngBytes(seed: Long): Array[Byte] = {
    val w = 16; val h = 16
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = mix64(seed ^ (y.toLong << 16) ^ x)
        img.setRGB(x, y, (v & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream(1024)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic RIFF/WAVE, PCM 16-bit LE mono 8kHz (real format). */
  private[ops] def wavBytes(seed: Long, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)        // PCM, mono
      .putInt(8000).putInt(16000)     // sample rate, byte rate
      .putShort(2).putShort(16)       // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      buf.putShort((mix64(seed ^ i) % 30000).toShort)
      i += 1
    }
    buf.array()
  }

  /** Deterministic synthetic media table with REAL payloads (PNG and
    * WAV bytes; video payload is opaque bytes — see class doc). */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions = 8).map { id =>
      val h = mix64(seed ^ id)
      val kind = (h & 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val payload = kind match {
        case "image" => pngBytes(h)
        case "audio" => wavBytes(h, 400 + (math.abs(h) % 800).toInt)
        case _ =>
          val len = 64 + (math.abs(h) % 192).toInt
          val bytes = new Array[Byte](len)
          var i = 0; var x = h
          while (i < len) { x = mix64(x); bytes(i) = x.toByte; i += 1 }
          bytes
      }
      MediaRow(id, kind,
        kind match { case "image" => "image/png"; case "audio" => "audio/wav"; case _ => "video/mp4" },
        if (kind == "image") 16 else 0,
        if (kind == "image") 16 else 0,
        if (kind == "image") 0L else 1000L + (math.abs(h) % 9000L),
        payload)
    }
  }

  /** Sentinel features for undecodable payloads: a corrupt asset must
    * become a recognizable error ROW, never a task failure (the
    * per-graph error-row convention, CanonEngine). */
  private[ops] val DecodeError: Array[Float] = Array.fill(8)(-1f)

  /** REAL image decode: ImageIO PNG → pixel statistics. */
  private def imageFeatures(payload: Array[Byte]): Array[Float] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null) return DecodeError // ImageIO returns null on unknown formats
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var minL = 255; var maxL = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
        sr += r; sg += g; sb += b
        val l = (r + g + b) / 3
        if (l < minL) minL = l
        if (l > maxL) maxL = l
        x += 1
      }
      y += 1
    }
    val n = (w * h).toFloat
    Array(w.toFloat, h.toFloat, sr / n, sg / n, sb / n,
      (sr + sg + sb) / (3 * n), minL.toFloat, maxL.toFloat)
  }

  /** REAL audio decode: RIFF/WAVE PCM-16LE → sample statistics. */
  private def audioFeatures(payload: Array[Byte]): Array[Float] = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (payload.length < 46 || payload(0) != 'R' || payload(8) != 'W')
      return DecodeError // not RIFF/WAVE or no samples after the header
    val n = (payload.length - 44) / 2
    buf.position(44)
    var sum = 0.0; var sumSq = 0.0
    var peak = 0; var zeroX = 0; var prev = 0
    var i = 0
    while (i < n) {
      val s = buf.getShort.toInt
      sum += s; sumSq += s.toDouble * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && ((s >= 0) != (prev >= 0))) zeroX += 1
      prev = s
      i += 1
    }
    Array(n.toFloat, (sum / n).toFloat, math.sqrt(sumSq / n).toFloat,
      peak.toFloat, zeroX.toFloat, 8000f, 16f, 1f)
  }

  /** STUB decode for video (clearly marked — no codec in a bare JDK):
    * deterministic features from payload bytes; replace with a real
    * frame decoder at deployment. */
  private def fakeVideoDecode(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var acc = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < payload.length) {
      acc = mix64(acc ^ payload(i))
      out(i % 8) += (acc % 1000L) / 1000.0f
      i += 1
    }
    out
  }

  /** decode + feature-extract + frame-sample as one mapPartitions
    * pass (single decode per asset; per-partition "codec" setup). */
  def extractFeatures(media: Dataset[MediaRow],
                      framesPerVideo: Int = 4): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here (ImageIO is static)
      it.map { m =>
        val feats =
          try m.kind match {
            case "image" => imageFeatures(m.payload)
            case "audio" => audioFeatures(m.payload)
            case _       => fakeVideoDecode(m.payload)
          } catch {
            // truncated / lying payloads must not kill the stage
            case scala.util.control.NonFatal(_) => DecodeError
          }
        val frames: Array[Long] =
          if (m.kind == "video" && m.duration_ms > 0)
            (0 until framesPerVideo)
              .map(i => i.toLong * m.duration_ms / framesPerVideo).toArray
          else Array.empty[Long]
        MediaFeatures(m.media_id, m.kind, m.payload.length, feats, frames)
      }
    }
  }

  /** REAL image resize (JDK Graphics2D bilinear): decode → scale →
    * re-encode PNG, one pass per partition; non-image rows pass
    * through untouched. The standard pre-training normalization
    * stage (fixed input resolution). */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        if (m.kind != "image") m
        else {
          val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
          val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, w, h, null)
          } finally g.dispose()
          val out = new ByteArrayOutputStream(1024)
          javax.imageio.ImageIO.write(dst, "png", out)
          m.copy(width = w, height = h, payload = out.toByteArray)
        }
      }
    }
  }

  /** Typed-metadata projection + pushdown-friendly filtering: the
    * binary column is NOT read when only metadata is selected
    * (parquet column pruning — verify via ReadSchema in explain). */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select("media_id", "kind", "mime", "width", "height", "duration_ms")
      .where(col("kind") =!= "video" || col("duration_ms") > 0)
}
