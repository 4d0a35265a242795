package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Lightweight k-means coresets: exact integer sensitivities, the
  * deterministic systematic draw, the outlier guarantee, and the
  * uniform degenerate case.
  */
class CoresetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dims = 4

  private def vecsDf(rows: Seq[(Long, Seq[Long])]) =
    rows.toDF("vec_id", "q")
      .withColumn("q", col("q").cast("array<long>"))
      .withColumn("n2", VectorSim.qnorm2($"q"))

  private def coreset(
      rows: Seq[(Long, Seq[Long])], m: Long, parts: Int = 1): Map[Long, (Long, Long, Long)] =
    VectorSim.lightweightCoreset(vecsDf(rows).repartition(parts), dims, m)
      .select($"vec_id", $"d2", $"w", $"sample_weight")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  /** Sequential reference for the sensitivity weights. */
  private def seqWeights(rows: Seq[(Long, Seq[Long])]): Map[Long, (Long, Long)] = {
    val n = rows.size.toLong
    val mu = (0 until dims).map(i =>
      math.round(rows.map(_._2(i)).sum.toDouble / n))
    val d2 = rows.map { case (id, q) =>
      id -> q.zip(mu).map { case (x, c) => (x - c) * (x - c) }.sum
    }.toMap
    val sum = d2.values.sum
    rows.map { case (id, _) =>
      id -> ((d2(id), if (sum == 0) 1L else sum + n * d2(id)))
    }.toMap
  }

  test("sensitivities are the exact cleared-denominator integers, the " +
    "draw sums to m, and the result is partitioning-invariant") {
    val rnd = new scala.util.Random(83)
    val rows = (1L to 120L).map(i =>
      (i, Seq.fill(dims)(rnd.nextInt(2000).toLong - 1000L)))
    val out = coreset(rows, m = 30L)
    val expect = seqWeights(rows)
    assert(out.values.map(_._3).sum == 30L)
    for ((id, (d2, w, _)) <- out) assert((d2, w) == expect(id), s"vec $id")
    assert(out == coreset(rows, 30L, parts = 9))
  }

  test("an outlier that dominates the clustering cost is ALWAYS in the " +
    "coreset (the half-distance mass of the lightweight construction)") {
    val rows = (1L to 200L).map(i => (i, Seq(0L, 0L, 0L, (i % 3)))) :+
      ((999L, Seq(100000L, 100000L, 100000L, 100000L)))
    val out = coreset(rows, m = 10L)
    assert(out.contains(999L), "the outlier must be sampled")
    assert(out(999L)._3 >= 4L, "the outlier carries most of the mass")
  }

  test("identical vectors degrade to a uniform draw (sum d2 = 0)") {
    val rows = (1L to 50L).map(i => (i, Seq(7L, 7L, 7L, 7L)))
    val out = coreset(rows, m = 12L)
    assert(out.values.map(_._3).sum == 12L)
    assert(out.values.forall { case (d2, w, _) => d2 == 0L && w == 1L })
  }
}
