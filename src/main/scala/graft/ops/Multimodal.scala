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
  * Decode status by modality — ALL REAL:
  *  - image: PNG bytes, decoded with the JDK's `javax.imageio`;
  *  - audio: RIFF/WAVE PCM-16LE, parsed directly;
  *  - video: an MJPEG-style container of concatenated PNG frames
  *    (`GMJ1` magic + length-prefixed frame table — see
  *    [[Multimodal.mjpngBytes]]); frame sampling picks indices FIRST
  *    and only the sampled frames are decoded (non-sampled frames are
  *    skipped by their length prefix without touching ImageIO) — at
  *    100 TB the decode cost is proportional to sampled frames, not
  *    stored frames. Swap the PNG frame codec for H.264
  *    (javacpp/ffmpeg) at deployment; the container walk, sampling,
  *    batching and feature schema are the production ones.
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
      // 8 per-asset features — decoded pixel/sample statistics for
      // all three kinds (PNG pixels, WAV PCM samples, GMJ1 video
      // frames decoded from the sampled offsets only)
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

  /** MJPEG-style video container: "GMJ1" magic, int32 frame count,
    * then per frame an int32 length prefix + real PNG bytes. The
    * length-prefixed frame table is what makes sampled decode
    * possible: a reader seeks past unsampled frames in O(1) per
    * frame. (Deterministic stand-in for a real codec container —
    * same structure as MJPEG/AVI's frame index.) */
  private[ops] def mjpngBytes(seed: Long, nFrames: Int): Array[Byte] = {
    val frames = Array.tabulate(nFrames)(i => pngBytes(mix64(seed ^ (0xF00DL + i))))
    val total = 8 + frames.map(_.length + 4).sum
    val buf = java.nio.ByteBuffer.allocate(total) // big-endian default
    buf.put("GMJ1".getBytes("US-ASCII")).putInt(nFrames)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Deterministic synthetic media table with REAL payloads (PNG,
    * WAV, and GMJ1 PNG-frame video — see class doc). */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    // width = cluster parallelism (scale-adaptive, not a constant):
    // the per-row payload ENCODE (ImageIO PNG) is the expensive part,
    // and a fixed 8 ran it at a quarter of the bench cores
    spark.range(0, n, 1,
      numPartitions = spark.sparkContext.defaultParallelism).map { id =>
      val h = mix64(seed ^ id)
      val kind = (h & 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val payload = kind match {
        case "image" => pngBytes(h)
        case "audio" => wavBytes(h, 400 + (math.abs(h) % 800).toInt)
        case _ => mjpngBytes(h, 3 + (math.abs(h) % 4).toInt)
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

  /** Evenly-spaced distinct sample indices over [0, nFrames). */
  private[ops] def sampleIndices(nFrames: Int, framesPerVideo: Int): Array[Long] =
    (0 until framesPerVideo).map(i => i.toLong * nFrames / framesPerVideo)
      .distinct.toArray

  /** REAL video decode over the GMJ1 container: validate the header,
    * walk the length-prefixed frame table, decode ONLY the frames in
    * `sampled` (others are skipped in O(1) by their length prefix),
    * and aggregate per-frame luma statistics into the 8-feature
    * vector. Any structural damage (bad magic, truncated table,
    * undecodable frame) yields (DecodeError, empty) — a sentinel row,
    * never a task failure. */
  private def videoFeatures(payload: Array[Byte],
                            framesPerVideo: Int): (Array[Float], Array[Long]) = {
    val none = (DecodeError, Array.empty[Long])
    if (payload.length < 8 || payload(0) != 'G' || payload(1) != 'M' ||
        payload(2) != 'J' || payload(3) != '1') return none
    val buf = java.nio.ByteBuffer.wrap(payload)
    buf.position(4)
    val nFrames = buf.getInt
    if (nFrames <= 0 || nFrames > 1000000) return none
    val sampled = sampleIndices(nFrames, framesPerVideo)
    val want = sampled.map(_.toInt).toSet
    var w = 0; var h = 0
    var sumLuma = 0.0
    var minLuma = Double.MaxValue; var maxLuma = Double.MinValue
    var prevLuma = Double.NaN; var sumDelta = 0.0; var nDelta = 0
    var decoded = 0
    var f = 0
    while (f < nFrames) {
      if (buf.remaining() < 4) return none
      val len = buf.getInt
      if (len < 0 || len > buf.remaining()) return none
      if (want.contains(f)) {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload, buf.position(), len))
        if (img == null) return none
        w = img.getWidth; h = img.getHeight
        var s = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            s += (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
            x += 1
          }
          y += 1
        }
        val luma = s.toDouble / (w * h)
        sumLuma += luma
        if (luma < minLuma) minLuma = luma
        if (luma > maxLuma) maxLuma = luma
        if (!prevLuma.isNaN) { sumDelta += math.abs(luma - prevLuma); nDelta += 1 }
        prevLuma = luma
        decoded += 1
      }
      buf.position(buf.position() + len) // O(1) skip — sampled or not
      f += 1
    }
    if (decoded == 0) return none
    val feats = Array(nFrames.toFloat, w.toFloat, h.toFloat,
      (sumLuma / decoded).toFloat, minLuma.toFloat, maxLuma.toFloat,
      (if (nDelta == 0) 0.0 else sumDelta / nDelta).toFloat, decoded.toFloat)
    (feats, sampled)
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
        val (feats, frames) =
          try m.kind match {
            case "image" => (imageFeatures(m.payload), Array.empty[Long])
            case "audio" => (audioFeatures(m.payload), Array.empty[Long])
            case _       => videoFeatures(m.payload, framesPerVideo)
          } catch {
            // truncated / lying payloads must not kill the stage
            case scala.util.control.NonFatal(_) => (DecodeError, Array.empty[Long])
          }
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
