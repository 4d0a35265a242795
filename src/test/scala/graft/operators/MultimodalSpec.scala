package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plumbing semantics of the multimodal stages (real javax.imageio
  * PNG codec, production-shaped schema/batching/partitioning).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta"),
    (1L, "one two three"),
    (2L, "a somewhat longer video-ish document with many more bytes than the others combined"),
    (3L, "short img"),
  ).toDF("doc_id", "text")

  private lazy val media = Multimodal.syntheticMedia(docs)
  private lazy val pngMedia = Multimodal.syntheticPngMedia(docs)

  test("synthetic media: kinds round-robin, payload = text bytes") {
    val m = media.collect().map(x => x.media_id -> x).toMap
    assert(m(0L).kind == "image" && m(1L).kind == "audio" && m(2L).kind == "video")
    assert(new String(m(0L).payload) == "alpha beta gamma delta epsilon zeta")
    assert(m.values.forall(x => x.meta.width > 0 && x.meta.height > 0))
  }

  test("PNG encode/decode round-trip is byte-exact across raster sizes") {
    val rng = new scala.util.Random(42)
    val cases = (0 until 30).map { i =>
      val (w, h) = (1 + rng.nextInt(20), 1 + rng.nextInt(20))
      val px = new Array[Byte](w * h)
      rng.nextBytes(px)
      Multimodal.Media(i.toLong, "image", Multimodal.encodePng(px, w, h),
        Multimodal.MediaMeta(w, h, 0, 1, "png")) -> px
    }
    val back = Multimodal.decodeImages(cases.map(_._1).toDS(), batchSize = 7)
      .collect().map(d => d.media_id -> d).toMap
    cases.foreach { case (m, px) =>
      val d = back(m.media_id)
      assert(d.width == m.meta.width && d.height == m.meta.height)
      assert(d.pixels.toSeq == px.toSeq, s"pixels differ for ${m.media_id}")
    }
    // payload is a real PNG, not a raw raster
    assert(cases.forall(_._1.payload.startsWith(
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))))
  }

  test("decode: image docs only, dims from the PNG header, cyclic-text raster") {
    val d1 = Multimodal.decodeImages(pngMedia).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeImages(pngMedia, batchSize = 1).collect().sortBy(_.media_id)
    assert(d1.map(_.media_id).toSeq == Seq(0L, 3L)) // ids ≡ 0 mod 3
    d1.foreach(i => assert(i.pixels.length == i.width * i.height))
    // batch size must not change results (pure batching)
    assert(d1.map(_.pixels.toSeq).toSeq == d2.map(_.pixels.toSeq).toSeq)
    // pixel i = text byte (i mod n): the decoded raster IS the text, cycled
    val text = "alpha beta gamma delta epsilon zeta".getBytes("UTF-8")
    val img0 = d1.find(_.media_id == 0L).get
    img0.pixels.zipWithIndex.foreach { case (b, i) =>
      assert(b == text(i % text.length))
    }
  }

  test("resize: exact target dims, nearest-neighbor is deterministic") {
    val r = Multimodal.resize(Multimodal.decodeImages(pngMedia), 4, 4).collect()
    assert(r.nonEmpty)
    r.foreach { i =>
      assert(i.width == 4 && i.height == 4 && i.pixels.length == 16)
    }
  }

  test("features: 16-dim, L1-normalized histogram") {
    val f = Multimodal.features(media).collect()
    assert(f.length == 4)
    f.foreach { x =>
      assert(x.features.length == 16)
      assert(math.abs(x.features.sum - 1.0f) < 1e-3)
    }
  }

  test("frame sampling: every 2nd fixed-size slice, 1->n rows") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 8, everyN = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.media_id == 2L)) // only the video
    val idxs = frames.map(_.frame_idx).sorted.toSeq
    assert(idxs == idxs.distinct && idxs.forall(_ % 2 == 0))
    assert(frames.forall(_.frame_payload.length <= 8))
  }

  test("audio energy: i16-LE sign extension, window boundaries, tail drop") {
    // hand-built payload: 5 samples [1, -1, 256, -32768, 32767] + one
    // trailing odd byte — windowSamples = 2 -> 2 full windows, sample 5
    // (incomplete window) and the odd byte dropped
    val bytes = Array[Byte](
      0x01, 0x00, // 1
      0xff.toByte, 0xff.toByte, // -1
      0x00, 0x01, // 256
      0x00, 0x80.toByte, // -32768
      0xff.toByte, 0x7f, // 32767
      0x42) // trailing odd byte
    val m = Seq(Multimodal.Media(7L, "audio", bytes,
      Multimodal.MediaMeta(0, 0, 16000, 1, "wav"))).toDS()
    val w = Multimodal.audioEnergy(m, windowSamples = 2)
      .collect().sortBy(_.window_idx)
    assert(w.map(_.window_idx).toSeq == Seq(0, 1))
    assert(w(0).energy == 1L * 1 + 1L * 1) // 1² + (−1)²
    assert(w(1).energy == 256L * 256 + 32768L * 32768) // 256² + (−32768)²
  }

  test("audio energy: only audio-kind rows produce windows") {
    val w = Multimodal.audioEnergy(media, windowSamples = 4).collect()
    assert(w.nonEmpty)
    assert(w.forall(_.media_id == 1L)) // only the audio doc
  }

  test("scene cuts: first frame is a keyframe; L1 deltas and the " +
    "255-per-byte tail penalty are exact") {
    val frames = Seq(
      Multimodal.Frame(5L, 0, Array[Byte](10, 20, 30)),
      Multimodal.Frame(5L, 1, Array[Byte](10, 25, 28)), // d = 0+5+2 = 7
      Multimodal.Frame(5L, 2, Array[Byte](10, 25)), // d = 0+0 + 255 (tail)
    ).toDS()
    val got = Multimodal.sceneCuts(frames, threshold = 100L)
      .collect().sortBy(_.frame_idx)
    assert(got.map(d => (d.frame_idx, d.delta, d.is_cut)).toSeq ==
      Seq((0, 0L, true), (1, 7L, false), (2, 255L, true)))
  }
}
