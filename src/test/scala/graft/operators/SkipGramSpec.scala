package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Closed forms and a sequential simulation for skip-gram pair
  * extraction: the window edges, empty-token position semantics
  * (dropped tokens still separate their neighbors), cross-document
  * aggregation, and window-1 vs window-2 behavior.
  */
class SkipGramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)], window: Int): Map[(String, String), Long] =
    TextAnalysis.skipGramPairs(docs.toDF("doc_id", "text"), window)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  /** In-memory reference: band scan over positions, no joins. */
  private def seqPairs(docs: Seq[(Long, String)], window: Int): Map[(String, String), Long] = {
    val all = for {
      (_, text) <- docs
      toks = text.split(" ", -1).zipWithIndex.filter(_._1.nonEmpty).toSeq
      (c, cp) <- toks
      (o, op) <- toks
      if op != cp && math.abs(op - cp) <= window
    } yield (c, o)
    all.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("window 1 on 'a b c': adjacent pairs only, both directions") {
    assert(pairs(Seq((1L, "a b c")), 1) === Map(
      ("a", "b") -> 1L, ("b", "a") -> 1L, ("b", "c") -> 1L, ("c", "b") -> 1L))
  }

  test("window 2 reaches across one intervening token; counts aggregate " +
    "across documents and repeated words") {
    val got = pairs(Seq((1L, "a b a"), (2L, "a b")), 2)
    // doc1: (a,b)x2, (b,a)x2, (a,a)x2; doc2: (a,b), (b,a)
    assert(got === Map(
      ("a", "b") -> 3L, ("b", "a") -> 3L, ("a", "a") -> 2L))
  }

  test("a run of spaces drops the empty token but keeps positional distance: " +
    "'a  b' at window 1 pairs nothing (positions 0 and 2)") {
    assert(pairs(Seq((1L, "a  b")), 1) === Map.empty)
    assert(pairs(Seq((1L, "a  b")), 2) === Map(("a", "b") -> 1L, ("b", "a") -> 1L))
  }

  private def phrases(docs: Seq[(Long, String)], minCount: Long): Map[(String, String), (Long, Long)] =
    TextAnalysis.phraseCandidates(docs.toDF("doc_id", "text"), minCount)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

  test("phraseCandidates: collocation score is the exact discounted ratio, " +
    "floor division, and minCount prunes") {
    // corpus: "x y" 3 times, "x z" once -> 10 tokens? build precisely:
    // doc1: "x y x y", doc2: "x y x z"  => tokens N=8
    // c(x)=4, c(y)=3, c(z)=1; bigrams: (x,y)=3, (y,x)=2, (x,z)=1
    val docs = Seq((1L, "x y x y"), (2L, "x y x z"))
    val got = phrases(docs, minCount = 2L)
    // (x,y): (3-1)*8*1000/(4*3) = 16000/12 = 1333 (floor)
    // (y,x): (2-1)*8*1000/(3*4) = 8000/12 = 666
    assert(got === Map(
      ("x", "y") -> (3L, 1333L),
      ("y", "x") -> (2L, 666L)))
  }

  test("phraseCandidates: a double space breaks adjacency (no bigram across it)") {
    val got = phrases(Seq((1L, "a b"), (2L, "a  b"), (3L, "a b")), minCount = 2L)
    // only docs 1 and 3 contribute (a,b); N counts all 6 non-empty tokens
    // (a,b): (2-1)*6*1000/(3*3) = 6000/9 = 666
    assert(got === Map(("a", "b") -> (2L, 666L)))
  }

  test("matches the sequential band-scan simulation on random corpora") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("w0", "w1", "w2", "w3", "w4", "w5")
    for (trial <- 1 to 3) {
      val docs = (1L to 8L).map { id =>
        val n = 3 + rnd.nextInt(15)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      assert(pairs(docs, 2) === seqPairs(docs, 2), s"trial $trial")
    }
  }
}
