package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `GraphAlgos.labelPropagation` — the pinned-tie synchronous LPA
  * behind q_graph_label_prop.
  */
class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a triangle converges to its min id; disconnected components " +
    "never mix labels") {
    import spark.implicits._
    // Hand-traced synchronous rounds with (max count, min label) ties:
    // triangle {1,2,3}: r1 → (2,1,1), r2 → (1,1,1), r3 stable. Same for
    // {7,8,9} shifted: converges to 7.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (7L, 8L), (8L, 9L), (7L, 9L)).toDF("u", "v")
    val out = GraphAlgos.labelPropagation(edges, "u", "v", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("tie between neighbor labels goes to the MIN label") {
    import spark.implicits._
    // node 5's neighbors carry labels {2, 9} with equal count after
    // round 0 (its neighbors are leaves labeled by their own ids)
    val edges = Seq((5L, 2L), (5L, 9L)).toDF("u", "v")
    val r1 = GraphAlgos.labelPropagation(edges, "u", "v", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(5L) == 2L) // {2, 9} tie → 2
  }

  test("random graphs match an independent dense synchronous simulation") {
    import spark.implicits._
    // per-node Map-based replay of the pinned-tie recurrence (max
    // neighbor-label count, then min label) — no joins, no argmax
    // aggregate, so an implementation slip in either side diverges
    def dense(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val adj = (edges ++ edges.map(_.swap)).distinct
        .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
      var lbl = adj.keys.map(n => n -> n).toMap
      for (_ <- 1 to iters) {
        lbl = adj.map { case (n, nbrs) =>
          val counts = nbrs.groupBy(lbl).map { case (l, g) => l -> g.size }
          val maxC = counts.values.max
          n -> counts.filter(_._2 == maxC).keys.min
        }
      }
      lbl
    }
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 10
      val edges = (for {
        a <- 1L to n; b <- (a + 1) to n
        if rnd.nextDouble() < 0.1
      } yield (a, b)).toSeq
      val got = GraphAlgos.labelPropagation(edges.toDF("u", "v"), "u", "v", iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === dense(edges, 3), s"trial $trial, |E|=${edges.size}")
    }
  }

  test("fixed rounds are deterministic across runs") {
    import spark.implicits._
    val edges = (1L to 60L).map(i => (i, i * 7 % 61 + 1)).toDF("u", "v")
    val a = GraphAlgos.labelPropagation(edges, "u", "v", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = GraphAlgos.labelPropagation(edges, "u", "v", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
