package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** n-gram decontamination semantics: hit counting, multiplicity rules,
  * self-containment exclusion is the caller's job, and the
  * broadcast-join plan shape the 100 TB story depends on.
  */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(
      docs: Seq[(Long, String)],
      bench: Seq[(Long, String)],
      n: Int = 3,
  ): Map[Long, (Long, Long, Long, Double)] =
    TextAnalysis
      .decontaminate(
        docs.toDF("doc_id", "text"),
        bench.toDF("bench_id", "text"), n)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  test("doc sharing a benchmark n-gram is flagged with exact gram counts") {
    val out = run(
      docs = Seq(
        (1L, "the quick brown fox jumps"), // shares "the quick brown" + "quick brown fox"
        (2L, "nothing in common here at all")),
      bench = Seq((100L, "the quick brown fox")))
    // doc 1: grams = {the quick brown, quick brown fox, brown fox jumps} (3);
    // matched = 2 of the bench's {the quick brown, quick brown fox}
    assert(out == Map(1L -> ((3L, 2L, 1L, 0.6667))))
  }

  test("matched grams are counted once even when repeated in the doc") {
    val out = run(
      docs = Seq((1L, "a b c x a b c")), // "a b c" appears twice; distinct grams: a b c, b c x, c x a, x a b
      bench = Seq((100L, "a b c")))
    assert(out(1L) == ((4L, 1L, 1L, 0.25)))
  }

  test("n_bench_docs counts distinct benchmark docs hit, not gram multiplicity") {
    val out = run(
      docs = Seq((1L, "p q r s")),
      bench = Seq((100L, "p q r"), (101L, "q r s"), (102L, "p q r")))
    // doc grams {p q r, q r s}; both match; bench docs hit = all three
    assert(out(1L) == ((2L, 2L, 3L, 1.0)))
  }

  test("docs shorter than n grams are never flagged") {
    val out = run(
      docs = Seq((1L, "a b")),
      bench = Seq((100L, "a b c")))
    assert(out.isEmpty)
  }

  test("benchmark side is broadcast; corpus never shuffles at full width") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c")).toDF("bench_id", "text")
    val p = TextAnalysis.decontaminate(docs, bench, 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"bench grams not broadcast:\n$p")
  }
}
