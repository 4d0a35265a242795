package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Length-bucketed batch planning: boundary semantics, the padding
  * arithmetic, the baseline row, and the bucketing-never-hurts
  * property.
  */
class BatchingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plan(ts: Seq[Long], bounds: Seq[Long], budget: Long = 64L) =
    Batching.lengthBucketedPlan(
      ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t"),
      bounds, budget)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect()
      .map(r => r._1 -> r)
      .toMap

  test("upper bounds are inclusive; overflow lands in the last bucket") {
    val out = plan(Seq(3L, 10L, 11L, 25L, 100L), bounds = Seq(10L, 25L))
    // bucket 0: {3,10}; bucket 1: {11,25}; bucket 2: {100}
    assert(out(0L)._2 == 2L && out(0L)._3 == 10L)
    assert(out(1L)._2 == 2L && out(1L)._3 == 25L)
    assert(out(2L)._2 == 1L && out(2L)._3 == 100L)
  }

  test("padding and batch arithmetic: padded = n*max, batches = ceil(n/floor(budget/max))") {
    val out = plan(Seq(8L, 6L, 4L), bounds = Seq(8L), budget = 16L)
    val b0 = out(0L)
    // n=3, seq_len=8, total=18, padded=24, batch_docs=floor(16/8)=2,
    // n_batches=ceil(3/2)=2, eff=18/24
    assert(b0 == ((0L, 3L, 8L, 18L, 24L, 2L, 2L, 0.75)))
    // baseline row repeats the same corpus unbucketed
    assert(out(-1L) == ((-1L, 3L, 8L, 18L, 24L, 2L, 2L, 0.75)))
  }

  test("a batch always fits at least one doc even when seq_len exceeds the budget") {
    val out = plan(Seq(100L), bounds = Seq(10L), budget = 16L)
    assert(out(1L)._6 == 1L && out(1L)._7 == 1L)
  }

  test("an all-zero-token bucket fails loudly instead of emitting " +
    "Infinity/NaN rows") {
    val e = intercept[Exception] {
      plan(Seq(0L, 0L), bounds = Seq(10L))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("seq_len 0")),
      s"expected the plan-level guard to fire: $e")
  }

  test("duplicate bounds leave the shadowed bucket empty (absent), like the SQL CASE") {
    val out = plan(Seq(5L, 20L), bounds = Seq(10L, 10L))
    assert(out.contains(0L) && !out.contains(1L) && out(2L)._2 == 1L)
  }

  test("aggregate bucketed efficiency is never below the unbucketed baseline") {
    val ts = (1L to 100L) ++ Seq(500L, 510L, 520L)
    val out = plan(ts, bounds = Seq(50L, 100L), budget = 1024L)
    val buckets = out.view.filterKeys(_ >= 0).values
    val bucketedEff =
      buckets.map(_._4).sum.toDouble / buckets.map(r => r._2 * r._3).sum
    val baseEff = out(-1L)._4.toDouble / out(-1L)._5
    assert(bucketedEff >= baseEff)
  }
}
