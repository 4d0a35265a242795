package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Forward-Backward-Trim SCC on per-entity digraphs, pinned against an
  * independent sequential Tarjan: closed-form shapes first (pure DAG =
  * all trim, cycles crossing BFS rounds, bridged cycles = pivot
  * splits), then randomized digraphs where every FW-BW code path —
  * trim cascade, pivot capture, three-way split, re-partition — gets
  * exercised across trials.
  */
class SccEntitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scc(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    SccEntity.scc(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  /** Sequential Tarjan (iterative, explicit stack) — a genuinely
    * different algorithm: one DFS, lowlinks, no trim/pivot/BFS.
    * scc id = the component's minimum node, matching the operator.
    */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val adj = edges.filter(e => e._1 != e._2).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val lowlink = scala.collection.mutable.Map.empty[Long, Int]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.Stack.empty[Long]
    var counter = 0
    val comps = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    def strongconnect(v0: Long): Unit = {
      // iterative DFS: frames of (node, remaining neighbors)
      val work = scala.collection.mutable.Stack[(Long, Iterator[Long])]()
      index(v0) = counter; lowlink(v0) = counter; counter += 1
      stack.push(v0); onStack += v0
      work.push((v0, adj.getOrElse(v0, Seq.empty).iterator))
      while (work.nonEmpty) {
        val (v, it) = work.top
        if (it.hasNext) {
          val w = it.next()
          if (!index.contains(w)) {
            index(w) = counter; lowlink(w) = counter; counter += 1
            stack.push(w); onStack += w
            work.push((w, adj.getOrElse(w, Seq.empty).iterator))
          } else if (onStack(w)) lowlink(v) = math.min(lowlink(v), index(w))
        } else {
          work.pop()
          if (work.nonEmpty) {
            val p = work.top._1
            lowlink(p) = math.min(lowlink(p), lowlink(v))
          }
          if (lowlink(v) == index(v)) {
            val comp = scala.collection.mutable.ArrayBuffer.empty[Long]
            var w = 0L
            do { w = stack.pop(); onStack -= w; comp += w } while (w != v)
            comps += comp.toSeq
          }
        }
      }
    }
    nodes.foreach(v => if (!index.contains(v)) strongconnect(v))
    comps.flatMap { c =>
      val id = c.min; val sz = c.size.toLong
      c.map(n => n -> ((id, sz)))
    }.toMap
  }

  test("a pure DAG is all singletons (the trim cascade alone finishes it)") {
    val out = scc(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(out == Map(1L -> ((1L, 1L)), 2L -> ((2L, 1L)),
      3L -> ((3L, 1L)), 4L -> ((4L, 1L))))
  }

  test("a 9-cycle is one component (BFS crosses many frontier rounds)") {
    val n = 9L
    val edges = (0L until n).map(i => (i + 10L, (i + 1L) % n + 10L))
    val out = scc(edges)
    assert(out.size == 9)
    assert(out.values.forall(_ == ((10L, 9L))))
  }

  test("two cycles joined by a one-way bridge stay separate (the split " +
    "step isolates the un-captured cycle for the next round)") {
    val out = scc(Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (2L, 3L)))
    assert(out == Map(
      1L -> ((1L, 2L)), 2L -> ((1L, 2L)),
      3L -> ((3L, 2L)), 4L -> ((3L, 2L))))
  }

  test("a node whose only edges are self-loops is a singleton, not absent") {
    val out = scc(Seq((7L, 7L), (1L, 2L), (2L, 1L)))
    assert(out == Map(7L -> ((7L, 1L)),
      1L -> ((1L, 2L)), 2L -> ((1L, 2L))))
  }

  test("giant SCC with DAG periphery: pivot captures the core, trim eats " +
    "the tails") {
    // core 1-2-3-1; tail into the core 10→11→1; tail out of it 3→20→21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 1L), (3L, 20L), (20L, 21L))
    val out = scc(edges)
    assert(out(1L) == ((1L, 3L)) && out(2L) == ((1L, 3L)) && out(3L) == ((1L, 3L)))
    for (n <- Seq(10L, 11L, 20L, 21L)) assert(out(n) == ((n, 1L)))
  }

  test("matches sequential Tarjan on random sparse digraphs") {
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 4) {
      val n = 15 + rnd.nextInt(25)
      val m = n + rnd.nextInt(2 * n)
      val edges = (1 to m).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.distinct
      assert(scc(edges) === tarjan(edges), s"trial $trial, |E|=${edges.size}")
    }
  }

  test("matches Tarjan on a larger mixed digraph (multiple nontrivial SCCs, " +
    "DAG periphery, disconnected weak components — every code path)") {
    val rnd = new scala.util.Random(101)
    val n = 60
    // sparse random core + planted cycles so nontrivial SCCs exist in
    // several disconnected regions (node ranges don't overlap)
    val planted = Seq(
      (0L until 6L).map(i => (i, (i + 1) % 6)),                 // 6-cycle
      (20L until 24L).map(i => (i, if (i == 23) 20L else i + 1)), // 4-cycle
      Seq((40L, 41L), (41L, 40L)),                               // 2-cycle
    ).flatten
    val random = (1 to 2 * n).map { _ =>
      val region = rnd.nextInt(3) * 20
      ((region + rnd.nextInt(15)).toLong, (region + rnd.nextInt(15)).toLong)
    }
    val edges = (planted ++ random).filter(e => e._1 != e._2).distinct
    val got = scc(edges)
    assert(got === tarjan(edges))
    assert(got.values.map(_._1).toSet.size > 5, "expected several SCCs")
  }

  test("matches Tarjan on a chain of 2-cycles (the FW-BW worst case: " +
    "neither trim nor split shrinks it fast — rounds ≈ #SCCs)") {
    // c0 ⇄ c0', c0→c1, c1 ⇄ c1', ... : min-pivot eats one SCC per round
    val k = 6L
    val edges = (0L until k).flatMap { i =>
      Seq((2 * i, 2 * i + 1), (2 * i + 1, 2 * i)) ++
        (if (i + 1 < k) Seq((2 * i, 2 * (i + 1))) else Seq.empty)
    }
    assert(scc(edges) === tarjan(edges))
  }

  test("a 100-SCC monotone-id chain converges under DEFAULT budgets " +
    "(hashed pivots: expected O(log C) rounds on the min-pivot worst case)") {
    // increasing ids along the chain — the adversarial order where a
    // min-node pivot always lands at the head and peels one SCC/round
    val k = 100L
    val edges = (0L until k).flatMap { i =>
      Seq((2 * i, 2 * i + 1), (2 * i + 1, 2 * i)) ++
        (if (i + 1 < k) Seq((2 * i, 2 * (i + 1))) else Seq.empty)
    }
    val got = scc(edges) // default maxRounds = 30
    assert(got === tarjan(edges))
    assert(got.values.map(_._1).toSet.size == k.toInt)
  }

  test("the same 100-SCC chain with DECREASING ids also converges under " +
    "default budgets (the other monotone adversary)") {
    val k = 100L
    val top = 2 * k - 1
    val edges = (0L until k).flatMap { i =>
      Seq((2 * i, 2 * i + 1), (2 * i + 1, 2 * i)) ++
        (if (i + 1 < k) Seq((2 * i, 2 * (i + 1))) else Seq.empty)
    }.map { case (u, v) => (top - u, top - v) }
    assert(scc(edges) === tarjan(edges))
  }

  test("result is invariant to input partitioning and edge duplication") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (1L, 2L), (2L, 3L))
    val base = scc(edges)
    val repart = SccEntity
      .scc(edges.toDF("src", "dst").repartition(7), "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(base == repart)
    assert(base(1L) == ((1L, 3L)) && base(4L) == ((4L, 1L)))
  }

  test("the maxRounds guard fails loudly on an over-budget SCC chain") {
    val k = 8L
    val edges = (0L until k).flatMap { i =>
      Seq((2 * i, 2 * i + 1), (2 * i + 1, 2 * i)) ++
        (if (i + 1 < k) Seq((2 * i, 2 * (i + 1))) else Seq.empty)
    }
    val ex = intercept[IllegalArgumentException] {
      SccEntity.scc(edges.toDF("src", "dst"), "src", "dst", maxRounds = 2)
    }
    assert(ex.getMessage.contains("maxRounds"))
  }
}
