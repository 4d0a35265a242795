package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Rare-bigram corpus scoring: occurrence/distinct accounting, the
  * threshold boundary, and the single-word edge.
  */
class RareBigramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-doc occurrence and corpus-frequency accounting is exact") {
    val docs = Seq(
      (1L, "a b a b c"), // "a b"×2, "b a", "b c"
      (2L, "a b x y"),   // "a b", "b x", "x y"
    ).toDF("doc_id", "text")
    // corpus: "a b"=3, everything else 1 → threshold 1 marks all but "a b"
    val out = TextAnalysis.rareBigrams(docs, maxCount = 1L)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    assert(out(1L) == ((4L, 3L, 2L, 1L, 8L, 0.5)))
    assert(out(2L) == ((3L, 3L, 2L, 1L, 5L, 0.6667)))
  }

  test("threshold is inclusive") {
    val docs = Seq((1L, "p q"), (2L, "p q"), (3L, "p q")).toDF("doc_id", "text")
    // "p q" corpus count 3: maxCount=3 → rare; maxCount=2 → not
    val rare = TextAnalysis.rareBigrams(docs, 3L).collect().map(_.getLong(3)).toSet
    val not = TextAnalysis.rareBigrams(docs, 2L).collect().map(_.getLong(3)).toSet
    assert(rare == Set(1L) && not == Set(0L))
  }

  test("single-word docs have no bigrams and are excluded") {
    val docs = Seq((1L, "solo"), (2L, "two words")).toDF("doc_id", "text")
    val ids = TextAnalysis.rareBigrams(docs, 10L).collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L))
  }
}
