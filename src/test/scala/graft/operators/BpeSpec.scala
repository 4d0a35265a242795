package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BPE training semantics on the classic example: frequency-weighted
  * pair counts, lexicographic tie-break, greedy-left merge application,
  * and overlap handling.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(texts: Seq[String], n: Int): Map[String, (Long, Long, String)] =
    Bpe.train(texts.toDF("text"), n)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("low/lower/lowest learns lo, low, lowe in order") {
    val out = run(Seq("low low low lower lowest"), 3)
    // merges: (l,o) ties (o,w) at 5 → lexicographic picks (l,o);
    // then (lo,w) at 5; then (low,e) at 2
    assert(out("low") == ((3L, 1L, "low")))
    assert(out("lower") == ((1L, 2L, "lowe r")))
    assert(out("lowest") == ((1L, 3L, "lowe s t")))
  }

  test("greedy-left application: merge (a,a) on aaa gives [aa, a]") {
    val out = run(Seq("aaa"), 1)
    assert(out("aaa") == ((1L, 2L, "aa a")))
  }

  test("zero merges returns character tokenization") {
    val out = run(Seq("ab ab c"), 0)
    assert(out("ab") == ((2L, 2L, "a b")) && out("c") == ((1L, 1L, "c")))
  }

  test("word frequency weights the pair counts") {
    // (x,y) appears once per word but xy is 3 words; (p,q) in 1 word
    val out = run(Seq("xy xy xy pq"), 1)
    assert(out("xy")._3 == "xy" && out("pq")._3 == "p q")
  }
}
