package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal pipeline queries (rows-only checked — binary payload
  * stages aren't SQL-expressible; determinism comes from the synthetic
  * corpus being a pure function of `documents`).
  */
object MultimodalQ {

  /** decode → resize → flattened pixel stats per image. */
  private val mediaDecodeResize = Q(
    "q_media_decode_resize",
    (s, dir) => {
      import s.implicits._
      val media = Multimodal.syntheticMedia(Tables(s, dir).documents)
      Multimodal
        .resize(Multimodal.decodeImages(media), 4, 4)
        .map(i => (i.media_id, i.width, i.height,
          i.pixels.map(b => (b & 0xff).toLong).sum))
        .toDF("media_id", "width", "height", "pixel_sum")
        .orderBy($"media_id")
    },
  )

  /** feature-extract over every modality; features flow into the same
    * vector kernels the embeddings table uses.
    */
  private val mediaFeatures = Q(
    "q_media_features",
    (s, dir) => {
      import s.implicits._
      Multimodal
        .features(Multimodal.syntheticMedia(Tables(s, dir).documents))
        .map(f => (f.media_id, f.kind, f.n_bytes,
          BigDecimal(f.features.map(_.toDouble).sum).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          f.features.length))
        .toDF("media_id", "kind", "n_bytes", "feature_l1", "n_dims")
        .orderBy($"media_id")
    },
  )

  /** frame sampling: one row per sampled frame. */
  private val mediaFrames = Q(
    "q_media_frame_sample",
    (s, dir) => {
      import s.implicits._
      Multimodal
        .sampleFrames(Multimodal.syntheticMedia(Tables(s, dir).documents),
          frameBytes = 32, everyN = 2)
        .map(f => (f.media_id, f.frame_idx, f.frame_payload.length.toLong))
        .toDF("media_id", "frame_idx", "frame_bytes")
        .orderBy($"media_id", $"frame_idx")
    },
  )

  val all: Seq[Q] = Seq(mediaDecodeResize, mediaFeatures, mediaFrames)
}
