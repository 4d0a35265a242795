package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Cross-table LSH candidates (the decontamination shape): over a
  * disjoint id split, bandPairsAcross must emit exactly the bandPairs
  * pairs that straddle the split — no corpus-corpus or probe-probe
  * pair, none lost — and the saturation cap must count bucket width
  * over BOTH sides together.
  */
class BandAcrossSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // probe side = even doc ids. bucket "x": docs 1,2,3,4 → straddling
  // pairs (1,2),(1,4),(3,2),(3,4); bucket "y": docs 5,6; bucket
  // "z": probe-only (6,8) — must never pair across.
  private val bands = Seq(
    (1L, 0, "x"), (2L, 0, "x"), (3L, 0, "x"), (4L, 0, "x"),
    (5L, 0, "y"), (6L, 0, "y"),
    (6L, 1, "z"), (8L, 1, "z"),
  )

  private def split(maxBucket: Int): Set[(Long, Long)] = {
    import spark.implicits._
    val df = bands.toDF("doc_id", "band", "band_hash")
    TextDedup
      .bandPairsAcross(
        df.filter(col("doc_id") % 2 === 1),
        df.filter(col("doc_id") % 2 === 0),
        maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("equals the straddling subset of the self-join form") {
    import spark.implicits._
    val full = TextDedup
      .bandPairs(bands.toDF("doc_id", "band", "band_hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // orient self-join pairs (lo, hi) as (odd corpus, even probe)
    val straddling = full.collect {
      case (a, b) if a % 2 == 1 && b % 2 == 0 => (a, b)
      case (a, b) if a % 2 == 0 && b % 2 == 1 => (b, a)
    }
    assert(split(Int.MaxValue) == straddling)
    assert(straddling == Set((1L, 2L), (1L, 4L), (3L, 2L), (3L, 4L), (5L, 6L)))
  }

  test("saturation cap counts the union: width-4 bucket dropped whole") {
    assert(split(3) == Set((5L, 6L)))
  }
}
