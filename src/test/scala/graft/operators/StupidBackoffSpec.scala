package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Stupid-backoff trigram scoring on a hand-computed corpus: each
  * backoff level's exact integer arithmetic, the derived-marginal
  * convention (bigram counts = trigram-prefix/suffix sums), and the
  * unseen-everywhere zero.
  *
  * Reference "a b c a b c a b d" → trigram counts (a,b,c):2 (b,c,a):2
  * (c,a,b):2 (a,b,d):1, N=7; prefix marginals c12(a,b)=3 c12(b,c)=2
  * c12(c,a)=2; suffix marginals c23(b,c)=2 c23(c,a)=2 c23(a,b)=2
  * c23(b,d)=1, c2(b)=3 c2(c)=2 c2(a)=2; c3(c)=2 c3(a)=2 c3(b)=2
  * c3(d)=1.
  */
class StupidBackoffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("all three backoff levels score exactly as hand-computed") {
    import spark.implicits._
    val ref = Seq((0L, "a b c a b c a b d")).toDF("doc_id", "text")
    val docs = Seq(
      // level 0: (a,b,c) in model → 10^6·2 div c12(a,b)=3 = 666666
      (1L, "a b c"),
      // (b,b,c) misses → level 1: 0.4·c23(b,c)/c2(b):
      //   2·((10^6·2) div 3) div 5 = 2·666666 div 5 = 266666
      // (b,c,a) hits → 10^6·2 div c12(b,c)=2 = 10^6
      // avg = (266666 + 10^6) div 2 = 633333
      (2L, "b b c a"),
      // w3 'q' unseen anywhere → level 2 with c3=0 → exactly 0
      (3L, "z z q"),
      // level 2: 0.4²·c3(d)/N = 4·((10^6·1) div 7) div 25
      //   = 4·142857 div 25 = 22857
      (4L, "x y d"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoffScore(docs, ref)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(1L) == ((1L, 1L, 0L, 666666L)))
    assert(out(2L) == ((2L, 1L, 1L, 633333L)))
    assert(out(3L) == ((1L, 0L, 0L, 0L)))
    assert(out(4L) == ((1L, 0L, 0L, 22857L)))
  }

  test("scores are bounded by scale: the derived-marginal convention " +
    "guarantees c123 <= c12 and c23 <= c2 on any input") {
    import spark.implicits._
    val ref = Seq(
      (0L, "a a a a a"), (1L, "a b a b a"), (2L, "c c b a c"),
    ).toDF("doc_id", "text")
    val docs = ref.union(
      Seq((3L, "b a c a b c"), (4L, "q a a b")).toDF("doc_id", "text"))
    val bad = TextAnalysis.stupidBackoffScore(docs, ref)
      .filter("avg_ppm < 0 OR avg_ppm > 1000000").count()
    assert(bad == 0L)
  }
}
