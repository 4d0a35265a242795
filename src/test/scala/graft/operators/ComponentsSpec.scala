package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Connected-components semantics, checked against an independent
  * union-find implementation on randomized graphs.
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Plain disjoint-set union — the reference answer. */
  private def dsu(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonical id = min node in component
    val byRoot = nodes.groupBy(find)
    byRoot.values.flatMap(ns => ns.map(_ -> ns.min)).toMap
  }

  private def run(edges: Seq[(Long, Long)], maxIters: Int = 20): Map[Long, Long] = {
    import spark.implicits._
    Components
      .connectedComponents(edges.toDF("a", "b"), "a", "b", maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two components and a shared-min chain") {
    val edges = Seq((5L, 3L), (3L, 9L), (20L, 21L))
    assert(run(edges) == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("empty edge list yields empty labels") {
    assert(run(Seq.empty).isEmpty)
  }

  test("a long chain needs diameter rounds but converges within budget") {
    // path 0-1-2-...-15: diameter 15, min label must walk the whole chain
    val edges = (0L until 15L).map(i => (i + 1, i))
    assert(run(edges, maxIters = 30) == (0L to 15L).map(_ -> 0L).toMap)
  }

  test("unconverged budget fails loudly instead of returning partial labels") {
    val edges = (0L until 15L).map(i => (i + 1, i))
    val e = intercept[IllegalArgumentException](run(edges, maxIters = 3))
    assert(e.getMessage.contains("did not converge"))
  }

  test("randomized: equals union-find on 50 random graphs") {
    val rnd = new Random(7)
    (0 until 50).foreach { trial =>
      val n = 2 + rnd.nextInt(30)
      val nEdges = 1 + rnd.nextInt(40)
      val edges = (0 until nEdges).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(run(edges, maxIters = 40) == dsu(edges), s"trial $trial: $edges")
    }
  }

  private def runStar(edges: Seq[(Long, Long)], maxIters: Int = 50): Map[Long, Long] = {
    import spark.implicits._
    Components
      .connectedComponentsStar(edges.toDF("a", "b"), "a", "b", maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("star alternation: equals union-find on 30 random graphs") {
    val rnd = new Random(11)
    (0 until 30).foreach { trial =>
      val n = 2 + rnd.nextInt(30)
      val nEdges = 1 + rnd.nextInt(40)
      val edges = (0 until nEdges).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(runStar(edges) == dsu(edges), s"trial $trial: $edges")
    }
  }

  test("star alternation converges in O(log^2 n) where min-label needs " +
    "diameter rounds: a 256-node path in <= 10 rounds") {
    val edges = (0L until 255L).map(i => (i + 1, i))
    // min-label at the same budget MUST throw (diameter 255 >> 10)...
    val e = intercept[IllegalArgumentException](run(edges, maxIters = 10))
    assert(e.getMessage.contains("did not converge"))
    // ...while the star loop finishes and labels every node 0
    assert(runStar(edges, maxIters = 10) == (0L to 255L).map(_ -> 0L).toMap)
  }

  test("star alternation: empty and self-loop-only edge lists") {
    assert(runStar(Seq.empty).isEmpty)
    // self-loops: the node exists, alone in its component
    assert(runStar(Seq((4L, 4L))) == Map(4L -> 4L))
  }
}
