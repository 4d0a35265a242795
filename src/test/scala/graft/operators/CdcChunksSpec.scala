package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Content-defined chunking: extent bookkeeping, the short-doc edge,
  * and the property fixed-stride chunking lacks — boundary stability
  * under a prefix edit.
  */
class CdcChunksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunksOf(text: String, w: Int = 4, divisor: Int = 16) =
    TextAnalysis.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"), w, divisor)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getString(4)))

  test("chunks tile the document exactly") {
    val words = (0 until 200).map(i => s"w${i % 37}")
    val ch = chunksOf(words.mkString(" "))
    assert(ch.head._1 == 1L)
    assert(ch.map(_._2).sum == 200L)
    // each chunk starts where the previous ended
    ch.sliding(2).foreach {
      case Array((s1, n1, _), (s2, _, _)) => assert(s2 == s1 + n1)
      case _ =>
    }
  }

  test("docs shorter than one hash window emit one whole-doc chunk") {
    val ch = chunksOf("a b c")
    assert(ch.toSeq == Seq((1L, 3L, ch.head._3)))
  }

  test("a prefix edit leaves every post-resynchronization digest intact") {
    val words = (0 until 300).map(i => s"t${(i * 7) % 53}")
    val base = chunksOf(words.mkString(" "))
    val edited = chunksOf(("INSERTED" +: words).mkString(" "))
    // fixed-stride chunking would shift every digest; CDC must
    // re-synchronize after the first content-determined cut
    val shared = base.map(_._3).toSet intersect edited.map(_._3).toSet
    assert(shared.nonEmpty, "no digest survived a one-word prefix edit")
    // and the shared suffix is the whole tail after the first cut:
    // every base chunk starting after the first cut position + window
    // must reappear in the edited doc
    val firstCutEnd = base.head._1 + base.head._2
    val tailDigests = base.filter(_._1 > firstCutEnd).map(_._3).toSet
    assert(tailDigests.subsetOf(edited.map(_._3).toSet))
  }

  test("expected chunk length tracks the divisor") {
    val words = (0 until 2000).map(i => s"u${(i * 13) % 997}")
    val ch = chunksOf(words.mkString(" "), divisor = 16)
    val mean = 2000.0 / ch.length
    assert(mean > 4 && mean < 64, s"mean chunk length $mean implausible for divisor 16")
  }
}
