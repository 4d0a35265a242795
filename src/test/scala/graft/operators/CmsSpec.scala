package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Count-min sketch semantics: never-underestimate, exactness without
  * collisions, cell-wise-addition mergeability, bounded state, and the
  * broadcast estimate-join plan shape.
  */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus: Seq[String] =
    Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++ Seq.fill(5)("gamma") ++
      ('a' to 'z').map(c => s"rare_$c")

  private def estimates(data: Seq[String], depth: Int, width: Int): Map[String, Long] = {
    val df = data.toDF("w")
    val cells = Sketches.cmsCells(df, $"w", depth, width)
    Sketches.cmsEstimate(cells, df, $"w", depth, width)
      .as[(String, Long)].collect().toMap
  }

  test("estimate never underestimates the true count") {
    val tru = corpus.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    // width 8 forces heavy collisions; the min-of-rows bound must hold anyway
    for (width <- Seq(8, 64, 4096)) {
      val est = estimates(corpus, depth = 3, width = width)
      tru.foreach { case (w, n) =>
        assert(est(w) >= n, s"width=$width underestimated $w: ${est(w)} < $n")
      }
    }
  }

  test("null keys are dropped on both build and probe paths: no " +
    "unmatchable NULL-pos cells, no silent 0 estimates") {
    val data = (corpus ++ Seq(null, null)).toDF("w")
    val cells = Sketches.cmsCells(data, $"w", 3, 1 << 20)
    assert(cells.filter($"pos".isNull).count() == 0,
      "null keys leaked NULL-pos cells into the sketch")
    val est = Sketches.cmsEstimate(cells, data, $"w", 3, 1 << 20)
      .as[(String, Long)].collect().toMap
    assert(!est.contains(null) && est("alpha") == 50L)
  }

  test("wide sketch with no cell collisions is exact") {
    val est = estimates(corpus, depth = 3, width = 1 << 20)
    assert(est("alpha") == 50L && est("beta") == 20L && est("gamma") == 5L)
    assert(('a' to 'z').forall(c => est(s"rare_$c") == 1L))
  }

  test("cells merge by addition: sketch(a ++ b) == cellwise sum") {
    val (a, b) = corpus.splitAt(corpus.size / 3)
    val whole = Sketches.cmsCells(corpus.toDF("w"), $"w", 3, 32)
      .as[(Int, Long, Long)].collect().toSet
    val merged = Sketches.cmsCells(a.toDF("w"), $"w", 3, 32)
      .unionAll(Sketches.cmsCells(b.toDF("w"), $"w", 3, 32))
      .groupBy($"r", $"pos").agg(sum($"cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("sketch state is bounded by depth*width and unseen keys read deterministically") {
    val cells = Sketches.cmsCells(corpus.toDF("w"), $"w", 3, 16)
    assert(cells.count() <= 3 * 16)
    val unseen = Sketches
      .cmsEstimate(cells, Seq("never_in_corpus").toDF("w"), $"w", 3, 16)
      .as[(String, Long)].collect().toMap
    // at width 16 its cells are almost surely occupied — value is the
    // collision mass, and must be repeatable
    val again = Sketches
      .cmsEstimate(cells, Seq("never_in_corpus").toDF("w"), $"w", 3, 16)
      .as[(String, Long)].collect().toMap
    assert(unseen == again)
  }

  test("estimate lookup joins the cells by broadcast") {
    val df = corpus.toDF("w")
    val cells = Sketches.cmsCells(df, $"w", 3, 1024)
    val plan = Sketches.cmsEstimate(cells, df, $"w", 3, 1024)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast cells join, got:\n$plan")
  }
}
