package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bigram-LM train/score gate: smoothed-probability arithmetic, unseen
  * accounting, tercile labeling, and the degenerate-tie edge.
  */
class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("add-one smoothed probabilities and unseen counts are exact") {
    // ref bigrams: "a b"×2, "b a" → c1(a)=2, c1(b)=1, V=|{b,a}|=2
    val ref = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b a"),  // "a b": (2+1)*1e6 div (2+2)=750000; "b a": (1+1)*1e6 div (1+2)=666666
      (2L, "z q"),    // unseen w1: (0+1)*1e6 div (0+2)=500000
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs, ref)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1: (750000 + 666666) div 2 = 708333, nothing unseen
    assert(out(1L) == ((2L, 0L, 708333L)))
    // doc 2: one bigram, unseen
    assert(out(2L) == ((1L, 1L, 500000L)))
  }

  test("tercile labels split by score with ties below the cut") {
    val ref = Seq((0L, "a b a b a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "z z"),   // unseen everywhere → low score → tail
      (2L, "b a"),   // seen w1, unseen transition → middle
      (3L, "a b"),   // the trained transition → head
    ).toDF("doc_id", "text")
    val lab = TextAnalysis.lmScore(docs, ref)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(lab == Map(1L -> "tail", 2L -> "middle", 3L -> "head"))
  }

  test("identical scores collapse into the lowest tercile") {
    val ref = Seq((0L, "a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b")).toDF("doc_id", "text")
    // one distinct score: t1 = t2 = that score → everything 'tail'
    val lab = TextAnalysis.lmScore(docs, ref)
      .collect().map(_.getString(4)).toSet
    assert(lab == Set("tail"))
  }

  test("importance ratio separates target-like from corpus-average docs") {
    val target = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b"), (2L, "z q")).toDF("doc_id", "text")
    val out = TextAnalysis.importanceWeights(docs, target)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    // doc 1: target 750000 vs corpus 666666 → ratio 1125 → keep
    assert(out(1L) == ((750000L, 666666L, 1125L, "keep")))
    // doc 2: target-unseen 500000 vs corpus 666666 → ratio 750 → drop
    assert(out(2L) == ((500000L, 666666L, 750L, "drop")))
  }

  test("sub-bigram docs are excluded from scoring and the cuts") {
    val ref = Seq((0L, "a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val ids = TextAnalysis.lmScore(docs, ref).collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L))
  }
}
