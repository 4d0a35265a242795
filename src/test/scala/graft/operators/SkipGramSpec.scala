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
