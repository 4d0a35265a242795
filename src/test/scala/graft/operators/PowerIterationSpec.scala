package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `VectorSim.powerIteration` — the covariance-free dominant-direction
  * solver behind q_embed_pca_power.
  */
class PowerIterationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("converges to the dominant axis when one coordinate carries " +
    "nearly all the variance") {
    import spark.implicits._
    // 3-dim corpus: coordinate 0 has ~10x the spread of the others, so
    // the Gram matrix's dominant eigenvector is ~e0. Milli-scale
    // normalization means the converged direction has |v[0]| ≈ 1000 and
    // tiny other components.
    val rows = Seq(
      (1L, Seq(1000L, 10L, -20L)),
      (2L, Seq(-900L, 30L, 10L)),
      (3L, Seq(1100L, -40L, 30L)),
      (4L, Seq(-1000L, 20L, -10L)),
      (5L, Seq(950L, -10L, 20L)),
    ).toDF("vec_id", "q")
    val v = VectorSim.powerIteration(rows, dims = 3, iters = 6)
    assert(v.length == 3)
    assert(math.abs(v.head) > 990, s"dominant axis not found: $v")
    assert(math.abs(v(1)) < 100 && math.abs(v(2)) < 100,
      s"minor axes too large: $v")
    // milli-normalized each round: ||v|| stays ~1000
    val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1000.0) < 5, s"iterate not milli-normalized: $norm")
  }

  test("sign is stable: the PSD Gram iteration keeps the all-ones " +
    "start's orientation (positive projection onto v0)") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(800L, 700L)),
      (2L, Seq(900L, 850L)),
      (3L, Seq(750L, 820L)),
    ).toDF("vec_id", "q")
    val v = VectorSim.powerIteration(rows, dims = 2, iters = 5)
    // every row points into the (+,+) quadrant, so the dominant
    // direction inherited from v0 = (1000, 1000) must too
    assert(v.forall(_ > 0), s"orientation flipped: $v")
  }

  test("fixed iteration count is deterministic: two runs agree exactly") {
    import spark.implicits._
    val rows = (1L to 40L).map { i =>
      (i, Seq(i * 37 % 101 - 50, i * 53 % 97 - 48, i * 71 % 89 - 44, i * 13 % 83 - 41))
    }.toDF("vec_id", "q")
    val a = VectorSim.powerIteration(rows, dims = 4, iters = 4)
    val b = VectorSim.powerIteration(rows, dims = 4, iters = 4)
    assert(a == b)
  }
}
