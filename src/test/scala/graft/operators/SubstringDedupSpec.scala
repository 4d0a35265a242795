package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Span semantics for crossDocRepeatedSpans: run merging, the k−1
  * span-length extension, the cross-document (not within-document)
  * duplication rule, and the short-doc guard.
  */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def spans(
      docs: Seq[(Long, String)],
      k: Int,
      minSpan: Int,
  ): Seq[(Long, Int, Long)] = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    TextDedup.crossDocRepeatedSpans(df, k, minSpan)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue(), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
      .toSeq
  }

  // a 6-word phrase shared verbatim by docs 1 and 2; with k=3 the
  // shared phrase yields 4 consecutive duplicated positions → one
  // maximal span of 4 + (3−1) = 6 words in each doc
  private val shared = "x1 x2 x3 x4 x5 x6"

  test("a shared phrase becomes one maximal span of run + k - 1 words in each doc") {
    val docs = Seq(
      1L -> s"a1 a2 $shared a3 a4",
      2L -> s"b1 $shared b2 b3 b4 b5",
      3L -> "c1 c2 c3 c4 c5 c6 c7 c8",
    )
    assert(spans(docs, k = 3, minSpan = 3) ==
      Seq((1L, 3, 6L), (2L, 2, 6L)))
  }

  test("minSpanWords filters short spans; spans at doc edges are kept") {
    val docs = Seq(
      1L -> s"$shared tail1 tail2", // span starts at position 1
      2L -> s"head1 head2 $shared", // span ends at the last word
    )
    assert(spans(docs, k = 3, minSpan = 6) == Seq((1L, 1, 6L), (2L, 3, 6L)))
    assert(spans(docs, k = 3, minSpan = 7).isEmpty)
  }

  test("a gram repeated only WITHIN one doc does not mark positions") {
    val docs = Seq(
      1L -> "p q r z p q r", // "p q r" twice in the same doc
      2L -> "s t u v w x y",
    )
    assert(spans(docs, k = 3, minSpan = 3).isEmpty)
  }

  test("two separated shared phrases yield two islands, not one") {
    val docs = Seq(
      1L -> s"$shared gap1 gap2 gap3 $shared",
      2L -> s"$shared z1 z2 z3 z4 z5 z6 z7 $shared",
    )
    val got = spans(docs, k = 3, minSpan = 3)
    // doc 1: 6-word phrase, 3-word gap, phrase again → spans at 1 and 10
    assert(got.filter(_._1 == 1L) == Seq((1L, 1, 6L), (1L, 10, 6L)))
    assert(got.filter(_._1 == 2L) == Seq((2L, 1, 6L), (2L, 14, 6L)))
  }

  test("docs shorter than k words emit no positions and never crash") {
    val docs = Seq(1L -> "one two", 2L -> "one two")
    assert(spans(docs, k = 3, minSpan = 3).isEmpty)
  }

  test("minDocs raises the duplication bar") {
    import spark.implicits._
    val df = Seq(
      1L -> s"$shared a",
      2L -> s"$shared b",
      3L -> "c1 c2 c3 c4 c5 c6 c7",
    ).toDF("doc_id", "text")
    assert(TextDedup.crossDocRepeatedSpans(df, 3, 3, minDocs = 3).count() == 0)
    assert(TextDedup.crossDocRepeatedSpans(df, 3, 3, minDocs = 2).count() == 2)
  }
}
