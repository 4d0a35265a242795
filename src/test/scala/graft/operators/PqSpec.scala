package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Product-quantization semantics checked against an independent
  * in-memory reference implementation: L2 Lloyd training per subspace,
  * code assignment, and the ADC score decomposition.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dims = 8
  private val m = 2
  private val d = dims / m

  // --- independent reference (plain Scala, no Spark) ----------------
  private def dot(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  /** round(avg) with Spark/DuckDB HALF_UP (away from zero) semantics —
    * math.round would differ on negative .5 averages.
    */
  private def roundHalfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def refKmeansL2(
      vecs: Map[Long, Seq[Long]],
      init: Map[Long, Seq[Long]],
      iters: Int): (Map[Long, Seq[Long]], Map[Long, Long]) = {
    def assign(cents: Map[Long, Seq[Long]]): Map[Long, Long] =
      vecs.map { case (id, q) =>
        id -> cents.toSeq.map { case (cid, qc) =>
          (dot(qc, qc) - 2 * dot(q, qc), cid)
        }.min._2
      }
    def update(a: Map[Long, Long]): Map[Long, Seq[Long]] =
      a.groupBy(_._2).map { case (cid, members) =>
        val qs = members.keys.toSeq.map(vecs)
        cid -> (0 until d).map(i => roundHalfUp(qs.map(_(i)).sum.toDouble / qs.size))
      }
    var cents = init
    var a = assign(cents)
    (1 until iters).foreach { _ =>
      cents = update(a)
      a = assign(cents)
    }
    (cents, a)
  }

  private val rnd = new scala.util.Random(41)
  private val corpus: Map[Long, Seq[Long]] =
    (0L until 24L).map(i => i -> Seq.fill(dims)(rnd.nextInt(2001) - 1000L)).toMap

  private def sub(q: Seq[Long], j: Int): Seq[Long] = q.slice(j * d, j * d + d)

  test("training, codes, and ADC scores match the reference end to end") {
    import spark.implicits._
    val e = corpus.toSeq.sortBy(_._1).toDF("vec_id", "q")
    val books = VectorSim.pqTrain(e, dims, m, initPred = $"vec_id" % 7 === 1, iters = 2)
    val codes = VectorSim.pqEncode(e, books, dims, m)
    val queries = e.filter($"vec_id" % 11 === 0)
    val scores = VectorSim.pqAdcScores(queries, codes, books, dims, m)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // reference: train each subspace, encode, ADC
    val refBooks = (0 until m).map { j =>
      val vs = corpus.map { case (id, q) => id -> sub(q, j) }
      val init = vs.filter(_._1 % 7 == 1)
      j -> refKmeansL2(vs, init, 2)
    }.toMap
    val gotCodes = codes.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (id <- corpus.keys; j <- 0 until m)
      assert(gotCodes((id, j)) == refBooks(j)._2(id),
        s"code mismatch for vec $id subspace $j")
    val refScores = for {
      qid <- corpus.keys.filter(_ % 11 == 0)
      cid <- corpus.keys if cid != qid
    } yield (qid, cid) -> (0 until m).map { j =>
      dot(sub(corpus(qid), j), refBooks(j)._1(refBooks(j)._2(cid)))
    }.sum
    assert(scores == refScores.toMap)
  }

  test("ADC is exact when the candidate equals its reconstruction") {
    import spark.implicits._
    // corpus of identical vectors: the (single-member) centroid IS the
    // vector, so ADC must equal the exact dot product
    val v = Seq.fill(dims)(7L)
    val e = Seq((1L, v), (8L, v)).toDF("vec_id", "q")
    val books = VectorSim.pqTrain(e, dims, m, initPred = $"vec_id" === 1, iters = 2)
    val codes = VectorSim.pqEncode(e, books, dims, m)
    val scores = VectorSim
      .pqAdcScores(e.filter($"vec_id" === 1), codes, books, dims, m)
      .collect().map(r => r.getLong(2))
    assert(scores.toSeq == Seq(dot(v, v)))
  }
}
