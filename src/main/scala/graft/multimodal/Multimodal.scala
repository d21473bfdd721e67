package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star surface, BASELINE.json):
  * image/audio/video as opaque `BinaryType` payloads with a typed
  * metadata struct, processed by per-partition batch operators.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch shapes, deterministic feature extraction. The IMAGE and AUDIO
  * codecs are real too: [[ImageCodec]] decodes PNG/BMP/GIF/JPEG payloads
  * through `javax.imageio` (JDK-built-in, headless) into genuine
  * grayscale rasters, with resize rendered by `Graphics2D`, and
  * [[AudioCodec]] decodes WAV/AIFF/AU payloads through
  * `javax.sound.sampled` into genuine 16-bit mono PCM. VIDEO decode is
  * real for MJPEG-in-AVI and uncompressed BI_RGB-in-AVI ([[VideoCodec]]:
  * a defensive RIFF chunk walker + per-frame JPEG decode / raw-DIB
  * raster arithmetic — the two mainstream video classes decodable with
  * the bare JDK). Payloads no reader claims — including the
  * synthetic fixture corpus, whose payloads are UTF-8 text, and video
  * codecs the JDK cannot entropy-decode (H.264 etc.) — fall back to
  * [[StubCodec.decode]]'s deterministic fake raster, so a crawl's
  * truncated/mislabeled bytes degrade instead of killing the stage.
  *
  * Batch shape: operators run `mapPartitions`-style over Datasets so a
  * real codec amortizes per-batch initialization (the JVM analogue of a
  * pandas-UDF `mapInPandas` batch loop), and payload bytes never pass
  * through a shuffle unless the caller repartitions first.
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, modality: String, payload: Array[Byte], meta: MediaMeta)
  final case class DecodedFrame(media_id: Long, frame_index: Int, width: Int, height: Int,
                                pixels: Array[Byte])
  final case class MediaFeature(media_id: Long, modality: String, feature: Array[Float])

  /** STUB codec — deterministic fake decode, the fallback when
    * [[ImageCodec]]/[[AudioCodec]]/[[VideoCodec]] cannot claim the
    * payload (inter-coded video like H.264 needs an external binary
    * like ffmpeg; everything downstream is codec-agnostic). */
  object StubCodec {
    /** ??? in spirit: produces a w×h "raster" whose bytes are a
      * deterministic function of the payload, so tests are stable. */
    def decode(payload: Array[Byte], meta: MediaMeta): Array[Byte] = {
      val out = new Array[Byte]((meta.width * meta.height).min(4096))
      var acc = 0x9e3779b9
      var i = 0
      while (i < out.length) {
        val b = if (payload.length > 0) payload(i % payload.length) else 0
        acc = acc * 31 + b
        out(i) = (acc >>> 24).toByte
        i += 1
      }
      out
    }
  }

  /** Build a synthetic media table from the documents table: payload =
    * UTF-8 bytes of the text (a stand-in for real image bytes), metadata
    * derived deterministically. This is the fixture generator for the
    * multimodal pipeline — at 100 TB the payloads come from object-store
    * parquet/iceberg with the same schema. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val modality = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        MediaRow(id, modality, text.getBytes("UTF-8"),
          MediaMeta(format = if (modality == "image") "png" else "mp4",
            width = (nChars % 64).toInt + 16, height = ((nChars / 64) % 64).toInt + 16,
            durationMs = if (modality == "image") 0L else nChars * 10))
      }
  }

  /** Decode each payload into frames; videos sample every `frameStep`-th
    * frame, images yield frame 0, audio yields one frame per second of
    * samples. Image payloads decode for REAL through [[ImageCodec]],
    * audio through [[AudioCodec]], and MJPEG-AVI video through
    * [[VideoCodec]] (dimensions/sample counts come from the actual
    * raster/PCM, not the metadata struct — crawl metadata lies);
    * undecodable payloads take the stub path. Runs per-partition so
    * codec state amortizes per batch, not per row. */
  def decodeFrames(media: Dataset[MediaRow], frameStep: Int = 10): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val real: Option[Iterator[DecodedFrame]] = m.modality match {
          case "image" => ImageCodec.decode(m.payload).map { case (w, h, px) =>
            Iterator.single(DecodedFrame(m.media_id, 0, w, h, px))
          }
          case "audio" => AudioCodec.decode(m.payload).map { case (rate, mono) =>
            // one frame per second: width = samples in the window, height
            // = 1, bytes = the window's 16-bit little-endian PCM
            mono.grouped(rate).zipWithIndex.map { case (chunk, idx) =>
              val px = new Array[Byte](chunk.length * 2)
              var i = 0
              while (i < chunk.length) {
                px(2 * i) = (chunk(i) & 0xFF).toByte
                px(2 * i + 1) = ((chunk(i) >> 8) & 0xFF).toByte
                i += 1
              }
              DecodedFrame(m.media_id, idx, chunk.length, 1, px)
            }
          }
          case "video" => VideoCodec.decode(m.payload).map { frames =>
            // sample every frameStep-th container frame, keeping the
            // ORIGINAL frame index so downstream time alignment holds
            frames.iterator.zipWithIndex
              .filter { case (_, i) => i % frameStep == 0 }
              .map { case ((w, h, px), i) => DecodedFrame(m.media_id, i, w, h, px) }
          }
          case _ => None
        }
        real match {
          case Some(frames) => frames
          case None =>
            val nFrames = if (m.modality == "image") 1
              else ((m.meta.durationMs / 1000).toInt.max(1).min(30))
            (0 until nFrames by (if (m.modality == "video") frameStep else 1)).iterator.map { f =>
              DecodedFrame(m.media_id, f, m.meta.width, m.meta.height,
                StubCodec.decode(m.payload, m.meta))
            }
        }
      }
    }
  }

  /** Deterministic feature extraction: 16-dim float vector from payload
    * byte histogram moments (stand-in for a real embedding model; the
    * pipeline shape — binary in, fixed-width Array[Float] out, ready for
    * graft.operators.SimilarityOps — is the real contract). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val hist = new Array[Long](16)
        m.payload.foreach(b => hist((b & 0xFF) % 16) += 1)
        val n = m.payload.length.max(1).toFloat
        MediaFeature(m.media_id, m.modality, hist.map(_ / n))
      }
    }
  }

  /** Resize metadata transform (pure column op — no payload shuffle). */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.format").as("format"),
      least(col("meta.width"), lit(maxDim)).as("width"),
      least(col("meta.height"), lit(maxDim)).as("height"),
      col("meta.durationMs").as("durationMs")))
}
