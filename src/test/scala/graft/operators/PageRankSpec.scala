package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PageRank semantics on hand-computed graphs: the damped integer
  * update, dangling-node mass leak, the teleport floor, and exact
  * truncation behavior (the property the oracle relies on).
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    PageRank.pagerank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a symmetric 2-cycle is a fixpoint at the initial mass") {
    // share = 10^6/1; update = 150000 + 85% of 10^6 = 10^6 exactly
    assert(ranks(Seq(1L -> 2L, 2L -> 1L), 3) == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("dangling nodes leak mass; in-degree-0 nodes keep the teleport floor") {
    // a→b, c→b: b is dangling (contributes nothing back)
    val r2 = ranks(Seq(1L -> 2L, 3L -> 2L), 2)
    assert(r2(1L) == 150000L && r2(3L) == 150000L)
    // iter1: b = 150000 + 85·(2·10^6)/100 = 1850000
    // iter2: b = 150000 + 85·(150000+150000)/100 = 405000
    assert(r2(2L) == 405000L)
  }

  test("integer division truncates exactly as documented") {
    // hub 1 → {2,3,4}, spokes → hub. share(hub) = 10^6 div 3 = 333333;
    // spoke update = 150000 + (85·333333) div 100 = 150000 + 283333
    val r1 = ranks(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 1L, 3L -> 1L, 4L -> 1L), 1)
    assert(r1(2L) == 433333L && r1(3L) == 433333L && r1(4L) == 433333L)
    assert(r1(1L) == 150000L + 85L * 3000000L / 100L)
  }

  private def ppr(edges: Seq[(Long, Long)], seeds: Seq[Long],
      iters: Int): Map[Long, Long] = {
    import spark.implicits._
    PageRank.personalized(edges.toDF("src", "dst"),
        seeds.toDF("node"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("personalized: seed-only teleport on a 2-cycle, hand-unrolled") {
    // seeds={1}: r0 = (10^6, 0)
    // i1: r1 = 150000 + 85·0/100 = 150000;      r2 = 0 + 85·10^6/100 = 850000
    // i2: r1 = 150000 + 85·850000/100 = 872500; r2 = 0 + 85·150000/100 = 127500
    // i3: r1 = 150000 + 85·127500/100 = 258375; r2 = 0 + 85·872500/100 = 741625
    assert(ppr(Seq(1L -> 2L, 2L -> 1L), Seq(1L), 3) ==
      Map(1L -> 258375L, 2L -> 741625L))
  }

  test("personalized: mass never reaches a component disconnected from " +
    "the seeds — its ranks are exactly zero, not the teleport floor") {
    val r = ppr(Seq(1L -> 2L, 2L -> 1L, 3L -> 4L, 4L -> 3L), Seq(1L), 3)
    assert(r(3L) == 0L && r(4L) == 0L)
    assert(r(1L) == 258375L && r(2L) == 741625L) // same as the 2-cycle alone
  }

  /** Independent dense reference for the scaled-integer recurrence
    * (VERDICT r5 #2): a per-node array simulation — no DataFrames, no
    * joins, indexed loops — replaying r' = seed·15%·scale +
    * (85·Σ(r div d)) div 100. Coded from the PAPER's recurrence rather
    * than the operator, so an implementation slip on either side
    * (wrong join key, coalesce placement, div-before-sum) diverges.
    */
  private def denseReference(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val outdeg = new Array[Long](nodes.size)
    edges.foreach { case (s, _) => outdeg(idx(s)) += 1 }
    val isSeed = nodes.map(n => if (seeds(n)) 1L else 0L).toArray
    var r = isSeed.map(_ * 1000000L)
    for (_ <- 1 to iters) {
      val contrib = new Array[Long](nodes.size)
      edges.foreach { case (s, d) =>
        contrib(idx(d)) += r(idx(s)) / outdeg(idx(s))
      }
      r = Array.tabulate(nodes.size) { i =>
        isSeed(i) * 150000L + 85L * contrib(i) / 100L
      }
    }
    nodes.map(n => n -> r(idx(n))).toMap
  }

  test("personalized: random graphs match the independent dense simulation") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 15 + trial * 10
      val edges = (for {
        a <- 1L to n; b <- 1L to n
        if a != b && rnd.nextDouble() < 0.12
      } yield (a, b)).toSeq
      val seeds = Seq(1L, 2L + trial)
      assert(ppr(edges, seeds, iters = 4) ===
        denseReference(edges, seeds.toSet, iters = 4),
        s"trial $trial, n=$n, |E|=${edges.size}")
    }
  }

  test("global pagerank: random graph matches the dense simulation with " +
    "all nodes seeded (teleport floor everywhere)") {
    val rnd = new scala.util.Random(13)
    val edges = (for {
      a <- 1L to 30L; b <- 1L to 30L
      if a != b && rnd.nextDouble() < 0.1
    } yield (a, b)).toSeq
    val allNodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(ranks(edges, 4) === denseReference(edges, allNodes.toSet, 4))
  }

  test("result is independent of edge partitioning") {
    import spark.implicits._
    val edges = (1L to 40L).map(i => i -> (i % 7 + 1))
    val a = PageRank.pagerank(edges.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = PageRank.pagerank(edges.toDF("src", "dst").repartition(13), "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  // --- hits ---

  private def hitsMap(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    PageRank.hits(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("hits: star fixpoint — the one hub at scale, leaves pure authorities") {
    val out = hitsMap(Seq((1L, 2L), (1L, 3L), (1L, 4L)), iters = 3)
    assert(out(1L) == ((1000000L, 0L)))
    assert(out(2L) == ((0L, 1000000L)))
    assert(out(3L) == ((0L, 1000000L)))
    assert(out(4L) == ((0L, 1000000L)))
  }

  test("hits: complete bipartite graph is symmetric at scale on both sides") {
    val out = hitsMap(Seq((1L, 11L), (1L, 12L), (2L, 11L), (2L, 12L)), iters = 3)
    assert(out(1L) == ((1000000L, 0L)) && out(2L) == ((1000000L, 0L)))
    assert(out(11L) == ((0L, 1000000L)) && out(12L) == ((0L, 1000000L)))
  }

  test("hits: one-iteration hand computation on an asymmetric bipartite graph") {
    // u1→{v1,v2}, u2→{v1}: a_raw v1=2e6, v2=1e6 → a(v1)=1e6, a(v2)=5e5;
    // h_raw u1=1.5e6, u2=1e6 → h(u1)=1e6, h(u2)=(1e6·1e6) div 1.5e6=666666
    val out = hitsMap(Seq((1L, 11L), (1L, 12L), (2L, 11L)), iters = 1)
    assert(out(11L)._2 == 1000000L && out(12L)._2 == 500000L)
    assert(out(1L)._1 == 1000000L && out(2L)._1 == 666666L)
    assert(out(11L)._1 == 0L && out(1L)._2 == 0L)
  }

  test("hits: plan depth is flat in the iteration count (normalized " +
    "tables are settled per round, not just the raw sums)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    def planNodes(iters: Int): Int =
      PageRank.hits(edges, "src", "dst", iters)
        .queryExecution.optimizedPlan.collect { case p => p }.size
    assert(planNodes(4) == planNodes(1),
      "a deeper HITS run must not carry a deeper analysis plan")
  }

  test("hits: result is independent of edge partitioning") {
    import spark.implicits._
    val edges = (1L to 40L).map(i => i -> (100L + i % 7))
    val a = PageRank.hits(edges.toDF("src", "dst"), "src", "dst", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = PageRank.hits(edges.toDF("src", "dst").repartition(13), "src", "dst", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
