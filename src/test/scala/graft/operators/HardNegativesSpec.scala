package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hard-negative mining invariants on the sf0.001 fixture: negatives
  * always carry a label different from the anchor's, at most k per
  * anchor, and per-anchor cosines are non-increasing in rank.
  */
class HardNegativesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mined negatives are label-disjoint, capped, and rank-ordered") {
    val rows = graft.queries.Registry
      .queriesMap("q_embed_hard_negatives")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(1) != r.getInt(3)),
      "a negative shares its anchor's label")
    val byAnchor = rows.groupBy(_.getLong(0))
    assert(byAnchor.values.forall(_.length <= 3))
    byAnchor.values.foreach { g =>
      val cos = g.sortBy(_.getInt(5)).map(_.getDouble(4)).toSeq
      assert(cos == cos.sorted.reverse, "cosine not non-increasing in rank")
    }
  }
}
