package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Systematic PPS: exact sample size, deterministic selection,
  * weight-proportional inclusion, oversized-unit multiplicity, and the
  * two-level prefix construction matching a sequential single-cumsum
  * reference.
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample(
      rows: Seq[(Long, Long)], k: Long,
      buckets: Int = 64, parts: Int = 1): Map[Long, Long] =
    Sampling.systematicPps(
      rows.toDF("id", "w").repartition(parts), "id", "w", k, buckets)
      .select($"id", $"sample_weight")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Sequential reference: ONE global cumsum over the same
    * (hash mod B, hash, id) order — no buckets, no windows. */
  private def seqSample(
      rows: Seq[(Long, Long)], k: Long, buckets: Int = 64): Map[Long, Long] = {
    val ordered = rows.map { case (id, w) =>
      val h = graft.functions.Fnv63.hash(id.toString.getBytes("UTF-8"))
      (h % buckets, h, id, w)
    }.sortBy(t => (t._1, t._2, t._3))
    val total = rows.map(_._2).sum
    var c = 0L
    ordered.flatMap { case (_, _, id, w) =>
      val prev = c; c += w
      val m = (c * k) / total - (prev * k) / total
      if (m > 0) Some(id -> m) else None
    }.toMap
  }

  test("sample multiplicities sum to exactly k, selection is deterministic, " +
    "and the bucketed construction equals the sequential single cumsum") {
    val rows = (1L to 500L).map(i => (i, (i % 13) + 1L))
    for (k <- Seq(1L, 10L, 97L)) {
      val s = sample(rows, k)
      assert(s.values.sum == k, s"k=$k")
      assert(s == seqSample(rows, k), s"k=$k")
      assert(s == sample(rows, k), s"k=$k re-run")
    }
  }

  test("result is invariant to input partitioning") {
    val rows = (1L to 300L).map(i => (i, (i % 7) + 1L))
    assert(sample(rows, 50L, parts = 1) == sample(rows, 50L, parts = 8))
  }

  test("an oversized unit (w >= W/k) is ALWAYS selected, with floor(k*w/W) " +
    "guaranteed multiplicity") {
    // one whale of weight 1000 among 100 minnows of weight 1: W = 1100
    val rows = (1L to 100L).map(i => (i, 1L)) :+ (999L, 1000L)
    val s = sample(rows, k = 11L)
    // k·w/W = 11·1000/1100 = 10 → the whale carries at least 10 of the 11
    assert(s.contains(999L) && s(999L) >= 10L)
    assert(s.values.sum == 11L)
  }

  test("inclusion tracks weight: the heavy half gets ~weight-share of a " +
    "large sample") {
    val rows = (1L to 1000L).map(i => (i, if (i <= 500) 9L else 1L))
    val s = sample(rows, 200L)
    val heavy = s.filter(_._1 <= 500).values.sum
    // heavy half holds 90% of the mass → expect ~180 of 200
    assert(heavy >= 160L && heavy <= 200L, s"heavy share $heavy")
  }

  test("non-positive weights fail loudly in-plan") {
    val ex = intercept[Exception] {
      sample(Seq((1L, 5L), (2L, 0L)), 2L)
    }
    assert(ex.getMessage.contains("non-positive weight"))
  }
}
