package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computable fixtures for the round-5 text screens: character
  * entropy (degenerate, uniform, out-of-alphabet cases) and the Gopher
  * rule flags (each rule violated in isolation so the per-rule flags
  * are pinned, not just the conjunctive keep).
  */
class TextScreensSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val alphabet: Seq[String] = ('a' to 'z').map(_.toString) :+ " "

  private def entropy(text: String): (Long, Double) = {
    val r = TextAnalysis
      .charEntropy(Seq((1L, text)).toDF("doc_id", "text"), alphabet)
      .collect().head
    (r.getLong(1), r.getDouble(2))
  }

  test("single repeated char: zero entropy") {
    assert(entropy("aaaa") === ((4L, 0.0)))
  }

  test("two equiprobable chars: exactly 1 bit") {
    assert(entropy("abab") === ((4L, 1.0)))
  }

  test("four equiprobable chars: exactly 2 bits") {
    assert(entropy("abcd") === ((4L, 2.0)))
  }

  test("out-of-alphabet chars are ignored by counts AND total") {
    // '!' and '9' are outside [a-z ]; only the two 'a's count
    assert(entropy("a!9a") === ((2L, 0.0)))
  }

  test("gopher flags: each rule fails in isolation") {
    val docs = Seq(
      // 10 words, mean len 2: fails word-count AND mean-word-length
      (1L, Seq.fill(10)("aa").mkString(" ")),
      // 50 words alternating alpha/beta: passes everything
      (2L, Seq.fill(25)("alpha beta").mkString(" ")),
      // 60 digit-words: fails ONLY the alphabetic-ratio rule
      (3L, Seq.fill(30)("12345 67890").mkString(" ")),
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherFlags(docs, nStop = 8)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getLong(4),
          x.getLong(5), x.getLong(6), x.getLong(7), x.getLong(8), x.getLong(9)))
      .toMap
    // doc 1: chars=29, words=10 → mwl=(29-9)/10=2.0
    assert(r(1L) === ((10L, 2.0, 1.0, 1L, 0L, 0L, 1L, 0L, 0L)))
    // doc 2: chars=274, words=50 → mwl=(274-49)/50=4.5; alpha+beta in top-8
    assert(r(2L) === ((50L, 4.5, 1.0, 2L, 1L, 1L, 1L, 1L, 1L)))
    // doc 3: chars=359, words=60 → mwl=(359-59)/60=5.0; digit words have no
    // alpha char; both digit words are frequent enough to be "stopwords"
    assert(r(3L) === ((60L, 5.0, 0.0, 2L, 1L, 1L, 0L, 1L, 0L)))
  }

  test("gopher stopword derivation is the corpus top-k with deterministic ties") {
    // 'a' and 'b' tie on corpus count (2 each); (count DESC, word ASC)
    // puts 'a' first; with nStop = 1 only 'a' survives → the all-b doc
    // has n_stop 0
    val docs = Seq((1L, "a a"), (2L, "b b")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherFlags(docs, nStop = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(4)).toMap
    assert(r === Map(1L -> 1L, 2L -> 0L))
  }
}
