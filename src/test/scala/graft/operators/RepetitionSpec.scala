package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Repetition-signal semantics: top-gram and duplicate-gram fractions
  * at each n, and the short-doc edge.
  */
class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, Seq[Any]] =
    TextAnalysis.repetition(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1))
      .toMap

  test("fractions are exact for a looping document") {
    val out = run(Seq((1L, "x y x y x")))
    // words: 5 occ, top x=3, both grams repeat → dup 5
    // bigrams: x y ×2, y x ×2 → top 2/4, dup 4/4
    // trigrams: x y x ×2, y x y ×1 → top 2/3, dup 2/3
    assert(out(1L) == Seq(5L, 0.6, 1.0, 0.5, 1.0, 0.6667, 0.6667))
  }

  test("a repetition-free document scores zero dup everywhere") {
    val out = run(Seq((1L, "a b c d")))
    assert(out(1L) == Seq(4L, 0.25, 0.0, 0.3333, 0.0, 0.5, 0.0))
  }

  test("docs shorter than n words have null fractions at that n") {
    val out = run(Seq((1L, "only two")))
    // 2 words: word/bigram stats exist, trigram stats are null
    assert(out(1L) == Seq(2L, 0.5, 0.0, 1.0, 0.0, null, null))
  }
}
