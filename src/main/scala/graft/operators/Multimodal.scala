package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side architecture is the real thing:
  *   - media rows are `(media_id, kind, payload BINARY, meta STRUCT)`;
  *   - heavy per-row work runs in `mapPartitions` over *batches*
  *     (the JVM analog of `mapInPandas`' arrow-batch shape — one
  *     codec/model instance per batch, amortized across rows);
  *   - partitioning is by `media_id` so a 1000-executor cluster
  *     decodes 1000 payload ranges concurrently and no task sees a
  *     skewed byte volume;
  *   - frame sampling is a flatMap (1 video row → n frame rows), the
  *     generator/posexplode shape.
  *
  * ⚠ STUB: the actual codecs are not in this container, so
  * `decodeBytes` is a deterministic fake (payload bytes are "decoded"
  * by seeding a byte generator from the payload itself). Swap
  * `decodeBytes` for a real imageio/ffmpeg call and nothing else
  * changes — schemas, batching, and partitioning are production-shaped.
  */
object Multimodal {

  final case class MediaMeta(
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int,
      format: String,
  )

  final case class Media(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      meta: MediaMeta,
  )

  final case class DecodedImage(
      media_id: Long,
      width: Int,
      height: Int,
      pixels: Array[Byte], // row-major grayscale
  )

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      histogram: Seq[Int], // 16-bin raw byte histogram (integer-exact)
      features: Seq[Float], // the same histogram, L1-normalized
  )

  final case class Frame(
      media_id: Long,
      frame_idx: Int,
      frame_payload: Array[Byte],
  )

  /** Deterministic fake corpus: one media row per document, payload
    * derived from the text bytes, kind round-robined. Gives the
    * pipeline real (varied-size) binary data without external files.
    */
  def syntheticMedia(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"doc_id", $"text").as[(Long, String)].map { case (id, text) =>
      val payload = text.getBytes(StandardCharsets.UTF_8)
      val kind = (id % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val w = 4 + (payload.length % 13)
      val h = 3 + (payload.length % 7)
      Media(id, kind, payload,
        MediaMeta(w, h, 16000, 1 + (payload.length % 5).toInt, kind match {
          case "image" => "png"
          case "audio" => "wav"
          case _ => "mp4"
        }))
    }
  }

  /** STUB decode: deterministic pixels from payload bytes (a real
    * build replaces this one function with the codec call).
    */
  private def decodeBytes(payload: Array[Byte], nPixels: Int): Array[Byte] = {
    val out = new Array[Byte](nPixels)
    if (payload.isEmpty) return out // empty payload decodes to zeros
    var acc = 17
    var i = 0
    while (i < nPixels) {
      acc = acc * 31 + payload(i % payload.length)
      out(i) = (acc & 0xff).toByte
      i += 1
    }
    out
  }

  /** Decode stage: binary payload → pixel buffer sized from metadata.
    * Batched mapPartitions — `batchSize` rows share one (stub) codec
    * instance, mirroring arrow-batch amortization.
    */
  def decodeImages(media: Dataset[Media], batchSize: Int = 64): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(_.kind == "image")
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one decoder per batch in a real build
          batch.map { m =>
            val n = m.meta.width * m.meta.height
            DecodedImage(m.media_id, m.meta.width, m.meta.height,
              decodeBytes(m.payload, n))
          }
        }
      }
  }

  /** Resize stage: nearest-neighbor downsample on the decoded buffer —
    * pure, per-row, deterministic.
    */
  def resize(imgs: Dataset[DecodedImage], w: Int, h: Int): Dataset[DecodedImage] = {
    val spark = imgs.sparkSession
    import spark.implicits._
    imgs.map { img =>
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        val sy = y * img.height / h
        while (x < w) {
          val sx = x * img.width / w
          out(y * w + x) = img.pixels(sy * img.width + sx)
          x += 1
        }
        y += 1
      }
      DecodedImage(img.media_id, w, h, out)
    }
  }

  /** Feature extraction: 16-bin byte histogram, L1-normalized — a
    * deterministic stand-in for a real encoder, emitting the same
    * `array<float>` shape VectorSim consumes.
    */
  def features(media: Dataset[Media], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val hist = new Array[Int](16)
          m.payload.foreach(b => hist((b & 0xff) / 16) += 1)
          val n = math.max(m.payload.length, 1).toFloat
          MediaFeatures(m.media_id, m.kind, m.payload.length,
            hist.toSeq, hist.map(_ / n).toSeq)
        }
      }
    }
  }

  /** Frame sampling: every `everyN`-th fixed-size slice of a video
    * payload becomes a frame row (1 → n flatMap).
    */
  def sampleFrames(
      media: Dataset[Media],
      frameBytes: Int,
      everyN: Int,
  ): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val nFrames = math.max(m.payload.length / frameBytes, 1)
      (0 until nFrames by everyN).map { f =>
        val from = f * frameBytes
        val until = math.min(from + frameBytes, m.payload.length)
        Frame(m.media_id, f, m.payload.slice(from, until))
      }
    }
  }
}
