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

  private def centsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.select($"cent_id", $"qc").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap

  test("weighted Lloyd with uniform weights equals the unweighted fit") {
    val rnd = new scala.util.Random(19)
    val rows = (1L to 80L).map(i =>
      (i, Seq.fill(dims)(rnd.nextInt(2000).toLong - 1000L)))
    val vecs = vecsDf(rows)
    val init = vecs.filter($"vec_id" % 20 === 1)
      .select($"vec_id".as("cent_id"), $"q".as("qc"), $"n2".as("n2c"))
    val plain = centsOf(VectorSim.kmeansFit(vecs, init, dims, iters = 3)._1)
    val uniform = centsOf(VectorSim.kmeansFitWeighted(
      vecs.withColumn("iw", lit(7L)), "iw", init, dims, iters = 3)._1)
    assert(uniform == plain)
  }

  test("a heavy weight pulls its cluster's centroid to the heavy point " +
    "(exact weighted mean, zero-weight rows contribute nothing)") {
    // one cluster: points at 100 and 1000 on dim 0 (nonzero norms —
    // the cosine assignment is ANSI-strict about zero vectors)
    val vecs = vecsDf(Seq(
      (1L, Seq(100L, 10L, 10L, 10L)), (2L, Seq(1000L, 10L, 10L, 10L))))
      .withColumn("iw", when($"vec_id" === 2L, lit(9L)).otherwise(lit(1L)))
    val init = vecsDf(Seq((1L, Seq(100L, 10L, 10L, 10L))))
      .select($"vec_id".as("cent_id"), $"q".as("qc"), $"n2".as("n2c"))
    val cents = centsOf(VectorSim.kmeansFitWeighted(
      vecs, "iw", init, dims, iters = 2)._1)
    // weighted mean = (1·100 + 9·1000) / 10 = 910
    assert(cents(1L) == List(910L, 10L, 10L, 10L))
    val zeroed = vecs.withColumn("iw",
      when($"vec_id" === 2L, lit(0L)).otherwise(lit(1L)))
    val cz = centsOf(VectorSim.kmeansFitWeighted(
      zeroed, "iw", init, dims, iters = 2)._1)
    assert(cz(1L) == List(100L, 10L, 10L, 10L))
  }
}
