package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Chunking and sequence-packing semantics: window/stride boundaries,
  * tail fragments, pack spill at the budget boundary, per-source
  * independence, and the narrow-map plan shape of chunking.
  */
class ChunkPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunk boundaries, overlap, and tail fragment") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, chunkWords = 4, strideWords = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // starts 0,3,6,9 → word windows [1-4],[4-7],[7-10],[10] — tail emits
    assert(out.toSeq == Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 1L)))
  }

  test("chunk digest is over the actual window text") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, 2, 2).collect()
      .map(r => (r.getLong(1), r.getString(3))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(out(0L) == md5hex("a b") && out(1L) == md5hex("c"))
  }

  test("chunking is a pure narrow map: zero exchanges") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val p = TextAnalysis.chunk(docs, 2, 2).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunk grew a shuffle:\n$p")
  }

  test("packing assigns by first token and spills across the boundary") {
    val docs = Seq(
      (1L, "s", (1 to 6).map(_ => "w").mkString(" ")),  // tokens 6, bef 0  → pack 0
      (2L, "s", (1 to 6).map(_ => "w").mkString(" ")),  // bef 6            → pack 0
      (3L, "s", (1 to 6).map(_ => "w").mkString(" ")),  // bef 12 (>10)     → pack 1
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.packSequences(docs, budget = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(1L -> ((0L, 0L)), 2L -> ((0L, 6L)), 3L -> ((1L, 2L))))
  }

  test("packs are independent per source") {
    val docs = Seq(
      (1L, "a", "w w w"), (2L, "b", "w w w"),
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.packSequences(docs, budget = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(1L -> ((0L, 0L)), 2L -> ((0L, 0L))))
  }
}
