package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The actual codec work is STUBBED (this container has no
  * image/audio libraries): `fakeDecode` derives deterministic
  * "pixels"/"samples" from the bytes so the Spark-side plumbing —
  * schema, batching, partitioning, output shape — is real and
  * testable. Swap `fakeDecode` for a real codec (e.g. javacpp/ffmpeg)
  * at deployment; nothing else changes.
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
      // decoded-feature stub: 8 deterministic floats per asset
      features: Array[Float],
      // frame sampling stub: frame offsets actually selected
      sampled_frames: Array[Long]
  )

  /** Deterministic synthetic media table (payload bytes derived from
    * splitmix64 — stands in for real blobs at test scale). */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions = 8).map { id =>
      val h = graft.pipeline.Corpus.mix64(seed ^ id)
      val kind = (h & 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 64 + (math.abs(h) % 192).toInt
      val bytes = new Array[Byte](len)
      var i = 0
      var x = h
      while (i < len) { x = graft.pipeline.Corpus.mix64(x); bytes(i) = x.toByte; i += 1 }
      MediaRow(id, kind,
        kind match { case "image" => "image/png"; case "audio" => "audio/wav"; case _ => "video/mp4" },
        if (kind == "image") 64 else 0,
        if (kind == "image") 64 else 0,
        if (kind == "image") 0L else 1000L + (math.abs(h) % 9000L),
        bytes)
    }
  }

  /** STUB decode: deterministic features from payload bytes. A real
    * implementation decodes pixels/samples here; signature, batch
    * shape (mapPartitions, one codec instance per partition) and
    * output schema are the production ones. */
  private def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var acc = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < payload.length) {
      acc = graft.pipeline.Corpus.mix64(acc ^ payload(i))
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
      // per-partition codec init would go here
      it.map { m =>
        val feats = fakeDecode(m.payload)
        val frames: Array[Long] =
          if (m.kind == "video" && m.duration_ms > 0)
            (0 until framesPerVideo)
              .map(i => i.toLong * m.duration_ms / framesPerVideo).toArray
          else Array.empty[Long]
        MediaFeatures(m.media_id, m.kind, m.payload.length, feats, frames)
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
