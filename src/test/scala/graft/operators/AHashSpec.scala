package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Average-hash semantics: the integer mean rule, string/packed-long
  * agreement (the packed hamming must equal the bit-string hamming the
  * oracle computes), and the 8x8 contract.
  */
class AHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hashAll(pxs: Seq[Array[Byte]]): Seq[(String, Long, Long)] = {
    import spark.implicits._
    val ds = spark.createDataset(pxs.zipWithIndex.map { case (px, i) =>
      Multimodal.DecodedImage(i.toLong, 8, 8, px)
    })
    Multimodal.aHash(ds).collect().sortBy(_.media_id)
      .map(r => (r.ahash, r.ah_hi, r.ah_lo)).toSeq
  }

  test("bit b is pixel*64 >= sum, string position b+1, zero raster is all ones") {
    val bright = new Array[Byte](64)
    bright(0) = 100.toByte // only pixel 0 clears 64x the mean
    val Seq((h0, hi0, lo0), (h1, hi1, lo1)) = hashAll(Seq(new Array[Byte](64), bright))
    assert(h0 == "1" * 64, "0 >= 0: the zero raster hashes to all ones")
    assert(hi0 == 0xFFFFFFFFL && lo0 == 0xFFFFFFFFL)
    assert(h1 == "1" + "0" * 63)
    assert(hi1 == (1L << 31) && lo1 == 0L)
  }

  test("packed-long hamming equals bit-string hamming on random rasters") {
    val rnd = new scala.util.Random(7)
    val rasters = Seq.fill(40) {
      val px = new Array[Byte](64)
      rnd.nextBytes(px)
      px
    }
    val hs = hashAll(rasters)
    for (Seq((ha, hiA, loA), (hb, hiB, loB)) <- hs.combinations(2)) {
      val packed =
        java.lang.Long.bitCount(hiA ^ hiB) + java.lang.Long.bitCount(loA ^ loB)
      val str = ha.zip(hb).count { case (x, y) => x != y }
      assert(packed == str, s"packed $packed != string $str for $ha / $hb")
    }
  }

  test("non-8x8 input is rejected") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(Multimodal.DecodedImage(1L, 4, 4, new Array[Byte](16))))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.aHash(ds).collect()
    }
    assert(e.getMessage != null)
  }
}
