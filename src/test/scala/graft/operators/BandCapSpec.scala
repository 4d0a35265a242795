package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The LSH saturation guard: buckets wider than maxBucket are dropped
  * whole; everything else pairs exactly as before.
  */
class BandCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // band 0 bucket "hot": 5 docs (saturated at cap 3); band 1 keeps
  // docs 1/2 paired; band 0 bucket "ok": 2 docs
  private val bands = Seq(
    (1L, 0, "hot"), (2L, 0, "hot"), (3L, 0, "hot"), (4L, 0, "hot"), (5L, 0, "hot"),
    (1L, 1, "b1x"), (2L, 1, "b1x"),
    (6L, 0, "ok"), (7L, 0, "ok"),
  )

  private def pairs(maxBucket: Int): Set[(Long, Long)] = {
    import spark.implicits._
    TextDedup
      .bandPairs(bands.toDF("doc_id", "band", "band_hash"), maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("uncapped: the saturated bucket emits all 10 pairs") {
    assert(pairs(Int.MaxValue).size == 10 + 1) // C(5,2) + (6,7); (1,2) dedup'd
  }

  test("capped: saturated bucket dropped whole, narrow buckets intact") {
    assert(pairs(3) == Set((1L, 2L), (6L, 7L)))
  }

  test("cap equal to the width keeps the bucket (strict >)") {
    assert(pairs(5).size == 11)
  }
}
