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

  test("domainCap keeps exactly cap docs in big groups, all of small ones") {
    val capped = Mixture.domainCap(corpus(), "grp", "doc_id", 150)
    val got = capped.groupBy($"grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 150L, "b" -> 150L, "c" -> 100L))
    // ranks are 1..n contiguous, and the selection is md5-determined:
    // rerun yields the identical kept set
    val k1 = capped.select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val k2 = Mixture.domainCap(corpus(), "grp", "doc_id", 150)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(k1 == k2)
    val ranks = capped.filter($"grp" === "c")
      .select($"rank_in_group").collect().map(_.getLong(0)).sorted.toSeq
    assert(ranks == (1L to 100L))
  }

  test("upsample repeats rare groups across epochs and tracks the target") {
    val df = corpus()
    val rt = Mixture.upsampleRates(df, "grp", 2800L) // 2x corpus
    val up = Mixture.upsample(df, rt, "grp", "doc_id")
    val r = rt.collect().map(x => x.getString(0) -> x.getLong(2)).toMap
    // rare group's rate exceeds one epoch; rates order inversely with
    // size (rate ∝ 1/sqrt(n), so c = 2×b exactly here)
    assert(r("c") > 10000L && r("c") > r("b") && r("b") > r("a"))
    assert(r("c") == r("b") * 2)
    val got = up.groupBy($"grp").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    for ((g, n) <- Seq("a" -> 900, "b" -> 400, "c" -> 100)) {
      val want = n * r(g) / 10000.0
      assert(math.abs(got(g) - want) <= math.max(2, want * 0.02),
        s"group $g: got ${got(g)}, want ~$want")
    }
    // per-row copies: epoch runs 0..n_copies-1 with no gaps
    val eps = up.filter($"grp" === "c").groupBy($"doc_id")
      .agg(org.apache.spark.sql.functions.countDistinct($"epoch").as("k"),
        org.apache.spark.sql.functions.max($"epoch").as("mx"))
      .collect()
    assert(eps.nonEmpty && eps.forall(x => x.getLong(1) == x.getLong(2) + 1))
  }
}
