package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** dropCommonLines semantics: df counts a doc once however often the
  * line repeats inside it, the threshold is strict, order survives
  * reassembly, and a fully-boilerplate doc yields empty text.
  */
class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], bp: Long) =
    TextAnalysis.dropCommonLines(docs.toDF("doc_id", "text"), bp)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("common line dropped everywhere; order of survivors preserved") {
    // "ad" in 3/4 docs = 7500 bp > 5000 bp threshold; others unique
    val out = run(Seq(
      1L -> "ad\nalpha one\nbeta one",
      2L -> "gamma two\nad\ndelta two",
      3L -> "epsilon three\nad",
      4L -> "zeta four",
    ), 5000L)
    assert(out(1L) == ((2L, 1L, "alpha one\nbeta one")))
    assert(out(2L) == ((2L, 1L, "gamma two\ndelta two")))
    assert(out(3L) == ((1L, 1L, "epsilon three")))
    assert(out(4L) == ((1L, 0L, "zeta four")))
  }

  test("in-doc repetition counts once toward df (strict threshold)") {
    // "x" repeats 3× inside doc 1 but df = 2 of 4 docs = exactly 5000
    // bp — NOT above the strict 5000 bp threshold, so it stays
    val out = run(Seq(
      1L -> "x\nx\nx\na one",
      2L -> "x\nb two",
      3L -> "c three",
      4L -> "d four",
    ), 5000L)
    assert(out(1L) == ((4L, 0L, "x\nx\nx\na one")))
    assert(out(2L) == ((2L, 0L, "x\nb two")))
  }

  test("doc made entirely of boilerplate reassembles to empty text") {
    // df=1 lines sit at 3333 bp ≤ 5000 (kept); "ad" at 10000 (dropped)
    val out = run(Seq(
      1L -> "ad",
      2L -> "ad\nreal two",
      3L -> "ad\nreal three",
    ), 5000L)
    assert(out(1L) == ((0L, 1L, "")))
    assert(out(2L) == ((1L, 1L, "real two")))
  }
}
