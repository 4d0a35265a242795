package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Fnv63

/** Sequential simulation + closed-form checks for word2vec frequent-word
  * subsampling (Mikolov et al. §2.3, integerized): the keep test is the
  * squared form coin²·c_w < tPpm·N·10⁶ with coin = fnv63(doc_pos_word)
  * mod 10⁶ — deterministic per token, so the Spark result must match an
  * in-memory replay token for token.
  */
class SubsampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], tPpm: Long): Map[String, (Long, Long)] =
    TextAnalysis.subsampleTokens(docs.toDF("doc_id", "text"), tPpm)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  /** In-memory reference: exact integer arithmetic over every token. */
  private def seqRun(docs: Seq[(Long, String)], tPpm: Long): Map[String, (Long, Long)] = {
    val toks = for {
      (id, text) <- docs
      (w, pos) <- text.split(" ", -1).zipWithIndex
      if w.nonEmpty
    } yield (id, pos, w)
    val n = BigInt(toks.size)
    val cw = toks.groupBy(_._3).view.mapValues(ts => BigInt(ts.size)).toMap
    toks.groupBy(_._3).map { case (w, ts) =>
      val kept = ts.count { case (id, pos, word) =>
        val coin = BigInt(
          Fnv63.hash(s"${id}_${pos}_$word".getBytes("UTF-8")) % 1000000L)
        coin * coin * cw(word) < BigInt(tPpm) * n * 1000000L
      }
      w -> (ts.size.toLong, kept.toLong)
    }
  }

  test("kept_count never exceeds orig_count and every word appears") {
    val docs = Seq((1L, "a a a a b"), (2L, "a b c"))
    val got = run(docs, tPpm = 1000L)
    assert(got.keySet === Set("a", "b", "c"))
    got.foreach { case (w, (orig, kept)) =>
      assert(kept >= 0L && kept <= orig, s"word $w")
    }
    assert(got("a")._1 === 5L && got("b")._1 === 2L && got("c")._1 === 1L)
  }

  test("tPpm = 10⁶ (threshold ≥ corpus mass) keeps every token: " +
    "coin² < 10⁶·N·10⁶/c_w holds since coin < 10⁶ and c_w ≤ N") {
    val docs = Seq((1L, "x x y"), (2L, "y z"))
    val got = run(docs, tPpm = 1000000L)
    got.foreach { case (w, (orig, kept)) => assert(kept === orig, s"word $w") }
  }

  test("empty tokens from repeated spaces are excluded but positions shift " +
    "like split(-1): the coin is position-sensitive") {
    // "a  b": positions 0 and 2 — the sim and the operator must agree on
    // the position fed into the hash, or kept counts diverge.
    val docs = Seq((1L, "a  b a"))
    assert(run(docs, 1000L) === seqRun(docs, 1000L))
  }

  test("matches the sequential simulation on random corpora at several tPpm") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("the", "of", "w2", "w3", "w4", "w5", "w6", "w7")
    for (trial <- 1 to 3; tPpm <- Seq(100L, 1000L, 100000L)) {
      val docs = (1L to 10L).map { id =>
        val n = 5 + rnd.nextInt(40)
        // skew: "the" is ~1/3 of tokens so subsampling actually fires
        id -> Seq.fill(n)(
          if (rnd.nextInt(3) == 0) "the" else vocab(rnd.nextInt(vocab.size))
        ).mkString(" ")
      }
      assert(run(docs, tPpm) === seqRun(docs, tPpm), s"trial $trial tPpm $tPpm")
    }
  }
}
