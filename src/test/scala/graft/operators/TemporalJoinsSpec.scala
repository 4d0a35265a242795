package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** As-of and binned range join semantics. */
class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def quotes = Seq(
    // (asset, ts, qv)
    ("A", 10L, 100L), ("A", 20L, 200L), ("A", 30L, 300L),
    ("B", 15L, 150L),
  ).toDF("asset", "ts", "qv")

  private def trades = Seq(
    ("A", 5L, 1L),   // before any quote
    ("A", 20L, 2L),  // exactly AT a quote ts → that quote matches
    ("A", 25L, 3L),  // between quotes → earlier one
    ("B", 99L, 4L),  // far after B's only quote
    ("C", 50L, 5L),  // key with no quotes at all
  ).toDF("asset", "ts", "tv")

  test("asOfJoin inner: latest at-or-before per key; unmatched rows drop") {
    val out = TemporalJoins.asOfJoin(trades, quotes, Seq("asset"), "ts")
      .select($"asset", $"ts", $"tv", $"qv")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("A", 20L, 2L, 200L),
      ("A", 25L, 3L, 200L),
      ("B", 99L, 4L, 150L),
    ))
  }

  test("asOfJoin forward: earliest at-or-after per key; the mirror of " +
    "backward incl. the equal-ts tie rule") {
    val out = TemporalJoins.asOfJoin(trades, quotes, Seq("asset"), "ts",
        direction = "forward")
      .select($"asset", $"ts", $"tv", $"qv")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("A", 5L, 1L, 100L),   // next quote at 10
      ("A", 20L, 2L, 200L),  // quote AT the trade ts matches
      ("A", 25L, 3L, 300L),  // next quote at 30
      // B@99 (no later quote) and C (no quotes) drop under inner
    ))
  }

  test("asOfJoin left: unmatched rows keep null payload") {
    val out = TemporalJoins.asOfJoin(trades, quotes, Seq("asset"), "ts", how = "left")
      .select($"asset", $"ts", $"qv")
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(out.contains(("A", 5L, None)) && out.contains(("C", 50L, None)))
    assert(out.contains(("A", 20L, Some(200L))))
    assert(out.size == 5)
  }

  test("asOfJoin plans one exchange per side-union (single keyed shuffle)") {
    val p = TemporalJoins.asOfJoin(trades, quotes, Seq("asset"), "ts")
      .queryExecution.executedPlan.toString
    // union of two local scans → one hashpartitioning exchange for the
    // window; no join operator at all
    assert(!p.contains("Join"), s"as-of should not plan a join:\n$p")
  }

  test("asOfJoin: NULL right timestamps never match (they'd otherwise " +
    "sort first and shadow-carry into every left row)") {
    val q = Seq((Option("A"), Option.empty[java.lang.Long], 999L),
      (Option("A"), Option(5L: java.lang.Long), 100L))
      .toDF("asset", "ts", "qv")
    val t = Seq(("A", 10L, 1L)).toDF("asset", "ts", "tv")
    val out = TemporalJoins.asOfJoin(t, q, Seq("asset"), "ts")
      .select($"qv").as[Long].collect().toSeq
    assert(out == Seq(100L)) // the null-ts quote is invisible
  }

  test("asOfJoin: NULL keys match nothing (relational semantics)") {
    val q = Seq((Option("A"), 10L, 100L), (Option.empty[String], 5L, 999L))
      .toDF("asset", "ts", "qv")
    val t = Seq((Option("A"), 20L, 1L), (Option.empty[String], 20L, 2L))
      .toDF("asset", "ts", "tv")
    val inner = TemporalJoins.asOfJoin(t, q, Seq("asset"), "ts")
      .select($"asset", $"qv").as[(String, Long)].collect().toSet
    assert(inner == Set(("A", 100L))) // null-key trade matched nothing
    val leftJ = TemporalJoins.asOfJoin(t, q, Seq("asset"), "ts", how = "left")
      .select($"asset", $"qv")
      .collect().map(r => (Option(r.getString(0)), Option(r.get(1)))).toSet
    assert(leftJ == Set((Some("A"), Some(100L)), (None, None)))
  }

  test("property: asOfJoin equals a naive per-row scan on random data") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      // right side unique per (key, ts) by construction
      val right = rnd.shuffle(
        (for { k <- 0 to 2; ts <- 0 to 30 } yield (k, ts))
          .filter(_ => rnd.nextBoolean()))
        .map { case (k, ts) => (s"K$k", ts.toLong, rnd.nextInt(1000).toLong) }
      val left = Seq.fill(15)(
        (s"K${rnd.nextInt(4)}", rnd.nextInt(35).toLong, rnd.nextInt(100).toLong))
      val got = TemporalJoins
        .asOfJoin(left.toDF("k", "ts", "lv"), right.toDF("k", "ts", "rv"),
          Seq("k"), "ts")
        .select($"k", $"ts", $"lv", $"rv")
        .as[(String, Long, Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val expect = left.flatMap { case (k, ts, lv) =>
        val prior = right.filter(r => r._1 == k && r._2 <= ts)
        if (prior.isEmpty) None
        else Some((k, ts, lv, prior.maxBy(_._2)._3))
      }.groupBy(identity).view.mapValues(_.length).toMap
      assert(got == expect)
    }
  }

  test("rangeJoinBinned equals the naive inequality join, including " +
    "intervals that straddle bin boundaries") {
    val points = spark.range(0, 1000).select($"id".as("ts"), ($"id" % 7).as("v"))
    val intervals = Seq(
      (1L, 0L, 99L),     // inside one bin
      (2L, 95L, 205L),   // straddles bins at width 100
      (3L, 150L, 150L),  // degenerate single-point interval
      (4L, 990L, 1200L), // runs past the data
    ).toDF("iid", "lo", "hi")
    val binned = TemporalJoins
      .rangeJoinBinned(points, "ts", intervals, "lo", "hi", binWidth = 100L)
      .groupBy($"iid").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(Long, Long, Long)].collect().toSet
    val naive = points.join(intervals, $"ts" >= $"lo" && $"ts" <= $"hi")
      .groupBy($"iid").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(Long, Long, Long)].collect().toSet
    assert(binned == naive && binned.map(_._1) == Set(1L, 2L, 3L, 4L))
  }

  test("reserved helper-name collisions fail fast instead of silently " +
    "corrupting the rewrite") {
    val s = TestSpark.spark
    import s.implicits._
    val l = Seq((1L, 10L, "x")).toDF("k", "ts", "__side")
    val r = Seq((1L, 5L, 2.0)).toDF("k", "ts", "q")
    val ex = intercept[IllegalArgumentException](
      TemporalJoins.asOfJoin(l, r, Seq("k"), "ts"))
    assert(ex.getMessage.contains("__side"))
    val rBad = Seq((1L, 5L, 2.0)).toDF("k", "ts", "__last_r")
    val lOk = Seq((1L, 10L, "x")).toDF("k", "ts", "v")
    assert(intercept[IllegalArgumentException](
      TemporalJoins.asOfJoin(lOk, rBad, Seq("k"), "ts"))
      .getMessage.contains("__last_r"))
    val pts = Seq((1L, 7L)).toDF("ts", "__bin")
    val iv = Seq((5L, 9L)).toDF("lo", "hi")
    assert(intercept[IllegalArgumentException](
      TemporalJoins.rangeJoinBinned(pts, "ts", iv, "lo", "hi", 10L))
      .getMessage.contains("__bin"))
  }

  test("intervalOverlapJoinBinned: exact overlap set, each pair EMITTED " +
    "ONCE even when the pair shares several bins") {
    val s = TestSpark.spark
    import s.implicits._
    // binWidth 10; pair (a1, b1) co-occupies bins 0,1,2 — the emit-once
    // rule must still produce a single row. a2/b2 touch but only at the
    // closed endpoints (overlap length 0 — still an overlap); a3 is
    // disjoint from everything; b3 overlaps nothing.
    val a = Seq((1L, 0L, 25L), (2L, 40L, 50L), (3L, 90L, 95L))
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq((1L, 5L, 28L), (2L, 50L, 60L), (3L, 200L, 210L))
      .toDF("b_id", "b_lo", "b_hi")
    val out = TemporalJoins
      .intervalOverlapJoinBinned(a, "a_lo", "a_hi", b, "b_lo", "b_hi", 10L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toList
    assert(out.sorted == List((1L, 1L), (2L, 2L)), s"got $out")
    assert(out.size == out.toSet.size, s"duplicate emission: $out")
    // negative bins (interval straddling 0) must not double-emit either
    val an = Seq((9L, -15L, 5L)).toDF("a_id", "a_lo", "a_hi")
    val bn = Seq((9L, -3L, 12L)).toDF("b_id", "b_lo", "b_hi")
    val outN = TemporalJoins
      .intervalOverlapJoinBinned(an, "a_lo", "a_hi", bn, "b_lo", "b_hi", 10L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toList
    assert(outN == List((9L, 9L)), s"got $outN")
    // disjoint side column names enforced
    val clash = Seq((1L, 0L, 1L)).toDF("a_id", "x", "y")
    assert(intercept[IllegalArgumentException](
      TemporalJoins.intervalOverlapJoinBinned(
        clash, "x", "y", clash, "x", "y", 10L))
      .getMessage.contains("disjoint"))
  }
}
