package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bloom screen semantics: the no-false-negative superset guarantee
  * against the exact join, deterministic false positives at tiny m,
  * per-gram all-probes-must-hit counting, and the broadcast plan
  * shape of the probe join.
  */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs today ok"),
    (3L, "the quick brown fox naps under the warm sun"),
    (4L, "completely unrelated vocabulary sentence number four here now"),
  )
  private val bench = Seq((100L, "the quick brown fox jumps high"))

  test("flagged grams are a superset of exact matches (no false negatives)") {
    val d = docs.toDF("doc_id", "text")
    val b = bench.toDF("doc_id", "text")
    val grams = TextDedup.shingles(d, 3)
    val benchGrams = TextDedup.shingles(b, 3).select($"sh").distinct()
    val exact = grams.join(benchGrams, "sh")
      .select($"doc_id", $"sh").as[(Long, String)].collect().toSet
    // even at an absurdly small m (guaranteed false positives) every
    // exact match must still be flagged
    for (m <- Seq(16, 256, 1 << 18)) {
      val bits = Bloom.bits(TextDedup.shingles(b, 3), $"sh", m, 3)
      val flagged = Bloom
        .screenGrams(grams, $"doc_id", $"sh", bits, m, 3)
        .filter($"hit" === 1)
        .select($"id", $"g").as[(Long, String)].collect().toSet
      assert(exact.subsetOf(flagged), s"m=$m lost an exact match")
    }
  }

  test("large m flags exactly the true matches; tiny m adds deterministic FPs") {
    val d = docs.toDF("doc_id", "text")
    val b = bench.toDF("doc_id", "text")
    val screenAt = (m: Int) =>
      Bloom.decontaminateScreen(d, b, n = 3, m = m, k = 3)
        .orderBy($"doc_id")
        .as[(Long, Long, Long, Double)].collect().toSeq
    // m = 2^18, a handful of bench grams: FP probability ~(4k/2^18)^3 —
    // effectively zero, so the screen equals the exact join here
    val wide = screenAt(1 << 18)
    // doc 1: grams {the quick brown, quick brown fox, brown fox jumps} hit 3;
    // doc 3 shares the first two; docs 2/4 share none
    assert(wide.map(r => r._1 -> r._3).toMap ==
      Map(1L -> 3L, 2L -> 0L, 3L -> 2L, 4L -> 0L))
    // tiny m: strictly more flags than wide, and bit-for-bit repeatable
    val tiny1 = screenAt(16)
    val tiny2 = screenAt(16)
    assert(tiny1 == tiny2)
    assert(tiny1.map(_._3).sum >= wide.map(_._3).sum)
  }

  test("a gram is flagged only when ALL k probes hit") {
    // bit set built from one gram; a candidate gram sharing SOME probe
    // positions (forced via m=2 — positions in {0,1}) must still need
    // all of its own probes set. With m=2 and k=3 every gram probes a
    // subset of {0,1}; build the bit set from a gram covering only one
    // position to see partial-hit grams rejected.
    val b = Seq((1L, "aa bb cc")).toDF("doc_id", "text") // one 3-gram
    val bits = Bloom.bits(TextDedup.shingles(b, 3), $"sh", 2, 3)
    val nBits = bits.count()
    val cand = Seq((1L, "xx yy zz"), (2L, "aa bb cc")).toDF("doc_id", "text")
    val out = Bloom
      .screenGrams(TextDedup.shingles(cand, 3), $"doc_id", $"sh", bits, 2, 3)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out(2L) == 1L) // the identical gram always passes
    if (nBits == 1) {
      // candidate probing the unset position must fail even if it also
      // probes the set one — verify via the screen's own accounting
      val probesOfXx = Bloom
        .screenGrams(
          Seq((9L, "xx yy zz")).toDF("doc_id", "text")
            .transform(TextDedup.shingles(_, 3)),
          $"doc_id", $"sh", bits, 2, 3)
        .as[(Long, String, Long)].collect()
      assert(probesOfXx.forall(r => r._3 == 0L || nBits == 2L))
    }
  }

  test("bit set is bounded by m and the probe join is broadcast") {
    val b = docs.toDF("doc_id", "text") // every doc as "reference"
    val m = 8
    val bits = Bloom.bits(TextDedup.shingles(b, 3), $"sh", m, 3)
    assert(bits.count() <= m)
    val screened = Bloom.screenGrams(
      TextDedup.shingles(docs.toDF("doc_id", "text"), 3),
      $"doc_id", $"sh", bits, m, 3)
    val plan = screened.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast probe join, got:\n$plan")
  }
}
