package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Temperature-mixture semantics: rare-group upweighting, the 10000 bp
  * cap, lattice-sample determinism, and realized-rate accuracy.
  */
class MixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 3 groups with 9:4:1 skew over sequential ids. */
  private def corpus(na: Int = 900, nb: Int = 400, nc: Int = 100) = {
    val rows = (1 to na).map(i => (i.toLong, "a")) ++
      (1 to nb).map(i => ((na + i).toLong, "b")) ++
      (1 to nc).map(i => ((na + nb + i).toLong, "c"))
    rows.toDF("doc_id", "grp")
  }

  private def rates(target: Long, na: Int = 900, nb: Int = 400, nc: Int = 100) =
    Mixture.temperatureRates(corpus(na, nb, nc), "grp", target)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("alpha=0.5 upweights rare groups: rate_c > rate_b > rate_a") {
    val r = rates(700)
    // sqrt weights: a=30000, b=20000, c=10000 → shares 1/2, 1/3, 1/6 of 700
    assert(r("a")._2 < r("b")._2 && r("b")._2 < r("c")._2)
    // fair shares: a: 350/900≈3888bp, b: 233/400≈5833bp, c: 116/100 → capped
    assert(r("a")._2 == 3888L && r("b")._2 == 5833L && r("c")._2 == 10000L)
  }

  test("rates cap at 10000 bp when the target exceeds the corpus") {
    assert(rates(100000).values.forall(_._2 == 10000L))
  }

  test("lattice sample is deterministic and tracks the rate within ~1%") {
    val df = corpus()
    val rt = Mixture.temperatureRates(df, "grp", 700)
    val s1 = Mixture.sample(df, rt, "grp", "doc_id")
    val got = s1.groupBy($"grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected = n * rate_bp / 10000 within ±1% of n (three-distance bound)
    val r = rates(700)
    for ((g, n) <- Seq("a" -> 900, "b" -> 400, "c" -> 100)) {
      val want = n * r(g)._2 / 10000.0
      assert(math.abs(got(g) - want) <= math.max(2, n * 0.01),
        s"group $g: got ${got(g)}, want ~$want")
    }
    // rerun produces the identical id set (no rand() anywhere)
    val ids1 = s1.select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Mixture.sample(df, rt, "grp", "doc_id")
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2 && ids1.nonEmpty)
  }
}
