package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Integer-L1 drift semantics: zero on identical snapshots, 2000 pm
  * (both distributions fully displaced) on a vanished group, monotone
  * response to a real shift.
  */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(String, Long)]) = rows.toDF("g", "v")

  private def l1(old: Seq[(String, Long)], nw: Seq[(String, Long)]): Map[String, (Long, Long, Long)] =
    Drift.histogramL1(df(old), df(nw), "g", "v", binWidth = 10L, nBins = 4)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("identical snapshots drift zero") {
    val snap = Seq(("a", 5L), ("a", 15L), ("a", 25L), ("b", 5L))
    assert(l1(snap, snap) == Map("a" -> ((3L, 3L, 0L)), "b" -> ((1L, 1L, 0L))))
  }

  test("a group absent from one snapshot is maximal drift, not an error") {
    val out = l1(Seq(("a", 5L), ("gone", 5L)), Seq(("a", 5L), ("fresh", 25L)))
    assert(out("gone") == ((1L, 0L, 1000L)))
    assert(out("fresh") == ((0L, 1L, 1000L)))
    assert(out("a") == ((1L, 1L, 0L)))
  }

  test("a full shift of one bin's mass moves l1 by twice its share") {
    // old: half mass bin0, half bin1; new: all mass bin1
    val out = l1(
      Seq(("a", 5L), ("a", 15L)),
      Seq(("a", 15L), ("a", 16L)))
    assert(out("a") == ((2L, 2L, 1000L))) // |500-0| + |500-1000|
  }

  test("overflow values clamp into the top bin") {
    val out = l1(Seq(("a", 999L)), Seq(("a", 35L))) // both → bin 3
    assert(out("a")._3 == 0L)
  }

  // --- chi2Tokens ---

  private def chi2(rows: Seq[(String, String)], minCount: Long = 1L) =
    Drift.chi2Tokens(rows.toDF("src", "text"), "src", "text", minCount)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  test("chi2Tokens: identical distributions diverge zero") {
    val out = chi2(Seq(("a", "x y"), ("b", "x y")))
    assert(out("a") == ((2L, 2L, 0L, 0.0)))
    assert(out("b") == ((2L, 2L, 0L, 0.0)))
  }

  test("chi2Tokens: disjoint vocabularies, hand-computed terms") {
    // a: {x}, b: {y}; mix is 50/50 so q_q = 5e8 for both words.
    // For a: p(x) = 1e9, p(y) = 0 → terms (5e8)²/5e8 = 5e8 each,
    // chi2_num = 1e9, chi2 = 1.0; symmetric for b.
    val out = chi2(Seq(("a", "x"), ("b", "y")))
    assert(out("a") == ((1L, 2L, 1000000000L, 1.0)))
    assert(out("b") == ((1L, 2L, 1000000000L, 1.0)))
  }

  test("chi2Tokens: minCount prunes the rare tail from the domain") {
    // 'z' appears once globally → dropped at minCount=2; both groups
    // then see the same {x} support and diverge zero over it.
    val out = chi2(Seq(("a", "x x z"), ("b", "x x")), minCount = 2L)
    assert(out("a") == ((2L, 1L, 0L, 0.0)))
    assert(out("b") == ((2L, 1L, 0L, 0.0)))
  }

  test("chi2Tokens: a group with no kept tokens is absent, not a blow-up") {
    val out = chi2(Seq(("a", "x x"), ("b", "only rare words")), minCount = 2L)
    assert(out.keySet == Set("a"))
  }

  test("chi2FromCounts over tokenCounts equals chi2Tokens (the streaming split)") {
    // The streaming monitor holds tokenCounts as complete-mode state
    // and runs chi2FromCounts on the final table; the composition must
    // be the batch operator exactly — including when the counts table
    // is re-based onto a fresh relation (the memory-sink self-join
    // path in q_stream_chi2_divergence).
    val rows = Seq(("a", "x x y z"), ("b", "x y y"), ("c", "z z q"))
    val df = rows.toDF("src", "text")
    val counts = Drift.tokenCounts(df, "src", "text")
    val rebased = spark.createDataFrame(counts.rdd, counts.schema)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).sortBy(_._1).toSeq
    val batch = canon(Drift.chi2Tokens(df, "src", "text", minCount = 2L))
    val split = canon(Drift.chi2FromCounts(rebased, minCount = 2L).withColumnRenamed("g", "src"))
    assert(split == batch && batch.nonEmpty)
  }

  private def cp(rows: Seq[(String, String, Long)]): Map[String, (Long, String, Long, Long)] =
    Drift.cusumChangepoint(rows.toDF("g", "p", "v"), "g", "p", "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("cusumChangepoint: a planted rate shift is localized at the last " +
    "pre-shift period (where the cumulative deviation peaks)") {
    // 10 periods: rate 10 for p01..p05, rate 30 for p06..p10.
    // S_N = 200; the deviation |N·S_i − i·S_N| peaks at i=5:
    // |10·50 − 5·200| = 500 → dev_ppm = 1e6·500/(10·200) = 250000
    val rows = (1 to 10).map(i => ("g", f"p$i%02d", if (i <= 5) 10L else 30L))
    val out = cp(rows)
    assert(out("g") == ((10L, "p05", 500L, 250000L)))
  }

  test("cusumChangepoint: a perfectly steady series has deviation 0 with " +
    "the earliest-period tie break") {
    val rows = (1 to 6).map(i => ("s", f"p$i%02d", 7L))
    val out = cp(rows)
    assert(out("s") == ((6L, "p01", 0L, 0L)))
  }

  private def ks(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Double, Long, Boolean) = {
    val r = Drift.ksTwoSample(rows.toDF("x", "sa"), "x", "sa").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
      r.getBoolean(5))
  }

  /** Sequential KS reference over exact rationals. */
  private def seqKs(rows: Seq[(Long, Boolean)]): (Long, Long, Double, Boolean) = {
    val a = rows.filter(_._2).map(_._1)
    val b = rows.filterNot(_._2).map(_._1)
    val support = rows.map(_._1).distinct.sorted
    val dn = support.map(x =>
      math.abs(b.size.toLong * a.count(_ <= x) - a.size.toLong * b.count(_ <= x)))
      .max
    val reject = BigInt(dn) * dn * 1000000L >
      BigInt(1844164L) * (a.size + b.size) * a.size * b.size
    (dn, support.minBy(x => (-math.abs(
      b.size.toLong * a.count(_ <= x) - a.size.toLong * b.count(_ <= x)), x)),
      dn.toDouble / (a.size.toLong * b.size), reject)
  }

  test("ksTwoSample: hand case — disjoint samples give D = 1 and reject; " +
    "identical samples give D = 0 and no rejection") {
    val disjoint = (1L to 30L).map(i => (i, true)) ++ (31L to 60L).map(i => (i, false))
    val (na, nb, dn, d, kx, rej) = ks(disjoint)
    assert((na, nb) == ((30L, 30L)))
    assert(dn == 900L && d == 1.0 && kx == 30L && rej)
    val same = (1L to 40L).flatMap(i => Seq((i % 7, true), (i % 7, false)))
    val (_, _, dn2, d2, _, rej2) = ks(same)
    assert(dn2 == 0L && d2 == 0.0 && !rej2)
  }

  test("ksTwoSample matches a sequential exact-rational reference on " +
    "random integer samples (statistic, argmax, and the libm-free " +
    "rejection verdict)") {
    val rnd = new scala.util.Random(89)
    for (trial <- 1 to 5) {
      val shift = trial % 3 // 0 = same law, else shifted
      val rows = (1 to 150).map(_ => (rnd.nextInt(25).toLong, true)) ++
        (1 to 130).map(_ => (rnd.nextInt(25).toLong + shift, false))
      val (na, nb, dn, d, kx, rej) = ks(rows)
      val (edn, ekx, ed, erej) = seqKs(rows)
      assert((na, nb) == ((150L, 130L)), s"trial $trial")
      assert(dn == edn && kx == ekx && rej == erej, s"trial $trial")
      assert(math.abs(d - ed) < 5e-7, s"trial $trial") // operator rounds to 6dp
    }
  }

  test("ksTwoSample: the support cap raises loudly on unbinned " +
    "high-cardinality values") {
    spark.conf.set("spark.graft.scoreSupportMaxRows", "50")
    try {
      val rows = (1L to 200L).map(i => (i, i % 2 == 0))
      val ex = intercept[Exception] { ks(rows) }
      assert(ex.getMessage.contains("scoreSupportMaxRows"), ex.getMessage)
    } finally spark.conf.unset("spark.graft.scoreSupportMaxRows")
  }

  test("cusumChangepoint: groups are independent and result is invariant " +
    "to input partitioning") {
    val rows = (1 to 12).flatMap(i => Seq(
      ("shift", f"p$i%02d", if (i <= 4) 5L else 20L),
      ("flat", f"p$i%02d", 11L)))
    val base = cp(rows)
    val repart = Drift
      .cusumChangepoint(rows.toDF("g", "p", "v").repartition(7), "g", "p", "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(base == repart)
    assert(base("shift")._2 == "p04" && base("flat")._4 == 0L)
  }

  test("ksGrouped: each group's row equals the ungrouped test run on " +
    "that group alone; an empty side gives NULL d_stat and no rejection") {
    val rnd = new scala.util.Random(23)
    val groups = Seq("g1", "g2", "g3")
    val rows = groups.flatMap { g =>
      val shift = g.length % 2
      (1 to 60).map(_ => (g, rnd.nextInt(15).toLong, true)) ++
        (1 to 50).map(_ => (g, rnd.nextInt(15).toLong + shift, false))
    }
    val out = Drift.ksGrouped(
        rows.toDF("g", "x", "sa").repartition(7), "g", "x", "sa")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getLong(5), r.getBoolean(6))))
      .toMap
    assert(out.keySet == groups.toSet)
    for (g <- groups) {
      val solo = ks(rows.filter(_._1 == g).map(t => (t._2, t._3)))
      assert(out(g) == solo, s"group $g")
    }
    val oneSided = Seq(("lone", 1L, true), ("lone", 2L, true))
    val r = Drift.ksGrouped(oneSided.toDF("g", "x", "sa"), "g", "x", "sa")
      .collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && !r.getBoolean(6))
  }
}
