package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Structural pins for SCC condensation: the fixture's event-type
  * net-flow graph happens to be strongly connected (one SCC of 5), so
  * the interesting shapes — disjoint cycles bridged one-way, pure
  * DAGs, long cycles exercising the path-doubling rounds — live here.
  */
class SccSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scc(edges: Seq[(String, String)]): Map[String, (String, Long)] =
    GraphAlgos.sccCondensation(edges.toDF("a", "b"), "a", "b")
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap

  test("two 2-cycles joined by a one-way bridge stay separate components") {
    val out = scc(Seq(("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"), ("b", "c")))
    assert(out == Map(
      "a" -> (("a", 2L)), "b" -> (("a", 2L)),
      "c" -> (("c", 2L)), "d" -> (("c", 2L))))
  }

  test("a pure DAG condenses to all singletons") {
    val out = scc(Seq(("a", "b"), ("b", "c"), ("a", "c")))
    assert(out == Map(
      "a" -> (("a", 1L)), "b" -> (("b", 1L)), "c" -> (("c", 1L))))
  }

  test("a 9-cycle is one component (path doubling crosses round boundaries)") {
    // 9 nodes: closure needs paths of length 8; doubling finds them by
    // round 3 (2^3 = 8) — the fixpoint check, not the round count, is
    // what certifies completeness
    val n = 9
    val edges = (0 until n).map(i => (s"v$i", s"v${(i + 1) % n}"))
    val out = scc(edges)
    assert(out.size == n)
    assert(out.values.forall(_ == (("v0", n.toLong))))
  }

  test("self-loops drop and do not fabricate 2-member components") {
    val out = scc(Seq(("a", "a"), ("a", "b")))
    assert(out == Map("a" -> (("a", 1L)), "b" -> (("b", 1L))))
  }

  test("a node whose ONLY edges are self-loops is a singleton SCC, " +
    "not silently absent") {
    val out = scc(Seq(("z", "z"), ("a", "b"), ("b", "a")))
    assert(out == Map(
      "z" -> (("z", 1L)),
      "a" -> (("a", 2L)), "b" -> (("a", 2L))))
  }

  test("result is invariant to input partitioning and edge duplication") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("a", "b"), ("b", "c")) // dupes on purpose
    val base = scc(edges)
    val repart = GraphAlgos
      .sccCondensation(edges.toDF("a", "b").repartition(7), "a", "b")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(base == repart)
    assert(base("a") == (("a", 3L)) && base("d") == (("d", 1L)))
  }

  test("the maxNodes guard fails loudly before any V² work") {
    val edges = (1 to 40).map(i => (s"n$i", s"n${i + 1}"))
    val ex = intercept[IllegalArgumentException] {
      GraphAlgos.sccCondensation(edges.toDF("a", "b"), "a", "b", maxNodes = 10L)
    }
    assert(ex.getMessage.contains("maxNodes"))
  }
}
