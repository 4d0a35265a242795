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

  private def distinctSample(
      rows: Seq[(Long, Long)], k: Long, parts: Int = 1): Map[Long, Boolean] =
    Sampling.ppsDistinct(
      rows.toDF("id", "w").repartition(parts), "id", "w", k)
      .select($"id", $"certain")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap

  /** Sequential reference for the certainty cascade: the literal
    * ITERATIVE form (take every w >= W/k, recompute, repeat) — a
    * different program shape from the operator's one-pass prefix
    * filter, which is the point of the cross-check. */
  private def seqCertainty(rows: Seq[(Long, Long)], k: Long): Set[Long] = {
    var pool = rows
    var kk = k
    var cert = Set.empty[Long]
    var changed = true
    while (changed && kk > 0 && pool.nonEmpty) {
      changed = false
      val tot = pool.map(_._2).sum
      val take = pool.filter { case (_, w) => w * kk >= tot }
      if (take.nonEmpty) {
        // one at a time, largest first (hash/id tiebreak), to mirror
        // the strict cascade semantics
        val next = take.maxBy { case (id, w) =>
          (w, -graft.functions.Fnv63.hash(id.toString.getBytes("UTF-8")), -id)
        }
        cert += next._1
        pool = pool.filterNot(_._1 == next._1)
        kk -= 1
        changed = true
      }
    }
    cert
  }

  test("ppsDistinct returns exactly k distinct items, every whale is " +
    "certain, and the one-pass prefix equals the iterative cascade") {
    val rows = (1L to 60L).map(i => (i, i * i)) // heavy tail → whales
    for (k <- Seq(3L, 7L, 20L)) {
      val s = distinctSample(rows, k)
      assert(s.size == k, s"k=$k: ${s.size} items")
      val expectCert = seqCertainty(rows, k)
      assert(s.filter(_._2).keySet == expectCert, s"k=$k certainty set")
      assert(s == distinctSample(rows, k, parts = 7), s"k=$k partitioning")
    }
  }

  test("ppsDistinct with no whales degenerates to 0/1 systematic PPS " +
    "(certain is false everywhere) and still returns exactly k") {
    val rows = (1L to 400L).map(i => (i, (i % 5) + 1L))
    val s = distinctSample(rows, 50L)
    assert(s.size == 50 && s.values.forall(_ == false))
    // agrees with plain systematicPps when nothing is certain
    val plain = sample(rows, 50L)
    assert(plain.values.forall(_ == 1L))
    assert(s.keySet == plain.keySet)
  }

  test("ppsDistinct where the cascade PROMOTES a mid-weight item: " +
    "removing the giant makes a second item oversized") {
    // giant 1000, then 30: W=1060, k=2 → giant certain (2000 >= 1060);
    // remainder W'=60, k'=1 → 30*1 >= 60? no... make it 40: 40 >= 60 no.
    // Use 3 items: 1000, 50, 10 → W=1060, k=2: giant yes (2000>=1060);
    // then 50*1 >= 60? no. Promote needs w' >= W'/k': 1000, 55, 5:
    // W'=60, 55 >= 60 no. 1000, 58, 2: 58 >= 60 no... take k=3:
    // 1000,60,30,20,...: W=1110+, 1000*3 >= W yes; W'=110, k'=2:
    // 60*2=120 >= 110 yes — promoted; W''=50, k''=1: 30 >= 50 no.
    val rows = Seq((1L, 1000L), (2L, 60L), (3L, 30L), (4L, 15L), (5L, 5L))
    val s = distinctSample(rows, 3L)
    assert(s.size == 3)
    assert(s(1L) && s(2L), s"cascade should certify 1 and 2: $s")
    assert(s.count(_._2) == 2, s"only 1 and 2 are certain: $s")
  }

  /** Sequential Hamilton apportionment: floor quotas, leftover seats
    * to the largest exact remainders (wg*k mod wt), ties by (wg desc,
    * group). */
  private def seqApportion(masses: Map[String, Long], k: Long): Map[String, Long] = {
    val wt = masses.values.sum
    val floors = masses.view.mapValues(wg => wg * k / wt).toMap
    val spare = k - floors.values.sum
    val order = masses.toSeq
      .sortBy { case (g, wg) => (-(BigInt(wg) * k mod BigInt(wt)), -wg, g) }
      .map(_._1)
    val bumped = order.take(spare.toInt).toSet
    masses.map { case (g, _) =>
      g -> (floors(g) + (if (bumped.contains(g)) 1L else 0L))
    }
  }

  test("stratifiedPps: budgets are the exact Hamilton apportionment, " +
    "they sum to k, and each stratum's draw equals an independent " +
    "within-stratum systematicPps at its budget") {
    val rows = (1L to 300L).map { i =>
      val g = s"s${i % 4}"
      (g, i, (i % 7) + 1L + (if (g == "s0") 20L else 0L)) // skewed masses
    }
    val df = rows.toDF("src", "id", "w")
    val out = Sampling.stratifiedPps(df, "src", "id", "w", k = 60L)
      .select($"src", $"id", $"k_g", $"sample_weight")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val masses = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val expectedAlloc = seqApportion(masses, 60L)
    val gotAlloc = out.groupBy(_._1).view.mapValues(_.head._3).toMap
    assert(gotAlloc == expectedAlloc.filter(_._2 > 0))
    assert(out.map(_._4).sum == 60L, "total multiplicity = k")
    for ((g, kg) <- expectedAlloc if kg > 0) {
      val sub = rows.filter(_._1 == g).map(t => (t._2, t._3))
      val expect = sample(sub, kg)
      val got = out.filter(_._1 == g).map(t => t._2 -> t._4).toMap
      assert(got == expect, s"stratum $g at k_g=$kg")
    }
  }

  test("stratifiedPps: a near-zero-mass stratum apportions to 0 and is " +
    "absent; result is invariant to input partitioning") {
    val rows = (1L to 200L).map(i => ("big", i, 50L)) :+ (("dust", 999L, 1L))
    val df = rows.toDF("src", "id", "w")
    val out = Sampling.stratifiedPps(df, "src", "id", "w", k = 10L)
      .select($"src").distinct().collect().map(_.getString(0)).toSet
    assert(out == Set("big"))
    val a = Sampling.stratifiedPps(df.repartition(1), "src", "id", "w", 10L)
      .select($"id", $"sample_weight").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.stratifiedPps(df.repartition(13), "src", "id", "w", 10L)
      .select($"id", $"sample_weight").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("ppsDistinct never duplicates and k > n fails loudly") {
    val rows = Seq((1L, 3L), (2L, 4L), (3L, 5L))
    val all = distinctSample(rows, 3L)
    assert(all.keySet == Set(1L, 2L, 3L))
    val ex = intercept[IllegalArgumentException] {
      Sampling.ppsDistinct(rows.toDF("id", "w"), "id", "w", 4L).collect()
    }
    assert(ex.getMessage.contains("without-replacement"))
  }
}
