package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Next-fit-decreasing packing semantics: decreasing placement order,
  * bin close on overflow, oversized-document totality, per-source
  * independence, and the single-exchange plan shape.
  */
class NfdPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def text(n: Int) = (1 to n).map(_ => "w").mkString(" ")

  private def pack(docs: Seq[(Long, String, String)], budget: Long) =
    TextAnalysis.packBinsNfd(docs.toDF("doc_id", "source", "text"), budget)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4))))
      .toMap

  test("greedy close/open at the budget boundary, decreasing order") {
    // sizes 6,5,4,3,2 at budget 10: [6] fill 6, +5 > 10 → close;
    // [5,4] fill 9, +3 > 10 → close; [3,2] fill 5
    val out = pack(
      Seq((1L, "s", text(6)), (2L, "s", text(5)), (3L, "s", text(4)),
        (4L, "s", text(3)), (5L, "s", text(2))),
      budget = 10)
    assert(out == Map(
      1L -> ((0L, 6L)),
      2L -> ((1L, 5L)), 3L -> ((1L, 9L)),
      4L -> ((2L, 3L)), 5L -> ((2L, 5L))))
  }

  test("small docs backfill after a large one exactly to the budget") {
    val out = pack(
      Seq((1L, "s", text(8)), (2L, "s", text(1)), (3L, "s", text(1))),
      budget = 10)
    // 8+1+1 = 10 ≤ budget: one bin
    assert(out == Map(1L -> ((0L, 8L)), 2L -> ((0L, 9L)), 3L -> ((0L, 10L))))
  }

  test("equal-length ties place in doc_id order") {
    val out = pack(
      Seq((2L, "s", text(4)), (1L, "s", text(4)), (3L, "s", text(4))),
      budget = 8)
    // order 1,2,3 → [1,2] then [3]
    assert(out == Map(1L -> ((0L, 4L)), 2L -> ((0L, 8L)), 3L -> ((1L, 4L))))
  }

  test("oversized document gets its own overflowing bin; packing is total") {
    val out = pack(
      Seq((1L, "s", text(15)), (2L, "s", text(3))),
      budget = 10)
    assert(out == Map(1L -> ((0L, 15L)), 2L -> ((1L, 3L))))
  }

  test("sources pack independently (bin ids restart per source)") {
    val out = TextAnalysis.packBinsNfd(
      Seq((1L, "a", text(6)), (2L, "a", text(6)),
        (3L, "b", text(2))).toDF("doc_id", "source", "text"),
      budget = 10)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> (("a", 0L)), 2L -> (("a", 1L)), 3L -> (("b", 0L))))
  }

  test("plan has exactly one exchange: the hash repartition on source") {
    val docs = Seq((1L, "s", text(3))).toDF("doc_id", "source", "text")
    val p = TextAnalysis.packBinsNfd(docs, 10).queryExecution.executedPlan.toString
    assert(p.contains("Exchange hashpartitioning(source"),
      s"expected the source hash exchange:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"NFD packing must not grow a second shuffle:\n$p")
  }

  test("budget must be positive") {
    val docs = Seq((1L, "s", "w")).toDF("doc_id", "source", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.packBinsNfd(docs, 0)
    }
  }
}
