package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal pipeline queries. The synthetic corpus is a pure
  * function of `documents` (payload = UTF-8 text bytes), so the
  * byte-level stages — histogram features and frame sampling — get
  * FULL DuckDB oracles (hex-nibble byte extraction on the oracle
  * side); only the stubbed iterative codec (decode/resize) stays
  * rows-only, since its hash-chain "decode" would need recursion to
  * express in SQL.
  */
object MultimodalQ {

  /** Per-bin count via DuckDB list_filter over the hex string: byte
    * i's HIGH NIBBLE is hex char 2i−1 (1-based), and histogram bin
    * (b & 0xff)/16 IS the high nibble.
    */
  private def duckBin(k: Int): String = {
    val d = "0123456789ABCDEF".charAt(k)
    s"len(list_filter(range(1, n_bytes + 1), i -> substr(hx, CAST(2*i - 1 AS BIGINT), 1) = '$d')) AS h$k"
  }

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

  /** feature-extract over every modality; the integer byte histogram
    * (the pre-normalization embedding) is oracle-checked bin by bin.
    */
  private val mediaFeatures = Q(
    "q_media_features",
    (s, dir) => {
      import s.implicits._
      Multimodal
        .features(Multimodal.syntheticMedia(Tables(s, dir).documents))
        .map(f => (f.media_id, f.kind, f.n_bytes, f.histogram))
        .toDF("media_id", "kind", "n_bytes", "hist")
        .select(
          Seq($"media_id", $"kind", $"n_bytes".cast("long").as("n_bytes")) ++
            (0 until 16).map(k =>
              element_at($"hist", k + 1).cast("long").as(s"h$k")): _*)
        .orderBy($"media_id")
    },
    Some(s"""WITH m AS (
            |  SELECT doc_id AS media_id,
            |         CASE doc_id % 3 WHEN 0 THEN 'image'
            |                         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
            |         encode(text) AS payload
            |  FROM documents
            |),
            |b AS (
            |  SELECT media_id, kind,
            |         octet_length(payload) AS n_bytes,
            |         hex(payload) AS hx
            |  FROM m
            |)
            |SELECT media_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes,
            |       ${(0 until 16).map(duckBin).mkString(",\n       ")}
            |FROM b
            |ORDER BY media_id""".stripMargin),
  )

  /** frame sampling: one row per sampled frame, with an exact payload
    * digest — the slice boundaries, tail clamping, and byte content
    * all oracle-checked.
    */
  private val mediaFrames = Q(
    "q_media_frame_sample",
    (s, dir) => {
      import s.implicits._
      Multimodal
        .sampleFrames(Multimodal.syntheticMedia(Tables(s, dir).documents),
          frameBytes = 32, everyN = 2)
        .map(f => (f.media_id, f.frame_idx, f.frame_payload))
        .toDF("media_id", "frame_idx", "fp")
        .select(
          $"media_id", $"frame_idx",
          length($"fp").cast("long").as("frame_bytes"),
          md5(hex($"fp")).as("frame_digest"),
        )
        .orderBy($"media_id", $"frame_idx")
    },
    // DuckDB can't substring a BLOB, so the oracle slices the HEX
    // text (2 chars/byte) — hex(slice(payload)) ≡ slice(hex(payload)),
    // so the digests agree by construction
    Some("""WITH m AS (
           |  SELECT doc_id AS media_id,
           |         hex(encode(text)) AS hx,
           |         octet_length(encode(text)) AS n_bytes
           |  FROM documents WHERE doc_id % 3 = 2
           |),
           |fr AS (
           |  SELECT media_id,
           |         CAST(f.f AS INT) AS frame_idx,
           |         substr(hx, CAST(f.f * 64 + 1 AS BIGINT), 64) AS fhx
           |  FROM m,
           |       unnest(range(0, greatest(n_bytes // 32, 1), 2)) AS f(f)
           |)
           |SELECT media_id, frame_idx,
           |       CAST(length(fhx) // 2 AS BIGINT) AS frame_bytes,
           |       md5(fhx) AS frame_digest
           |FROM fr
           |ORDER BY media_id, frame_idx""".stripMargin),
  )

  val all: Seq[Q] = Seq(mediaDecodeResize, mediaFeatures, mediaFrames)
}
