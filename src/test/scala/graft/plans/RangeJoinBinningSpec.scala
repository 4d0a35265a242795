package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The range-join optimizer rule: plan rewrite, semantic equivalence,
  * and the guards that keep it inert where it doesn't apply.
  */
class RangeJoinBinningSpec extends AnyFunSuite {

  private def freshSession() = {
    val s = TestSpark.spark.newSession()
    s.experimental.extraOptimizations = Seq(RangeJoinBinning)
    s
  }

  test("naive BETWEEN join rewrites to a binned equi-join; results equal " +
    "the nested loop, including straddling and out-of-range intervals") {
    val s = freshSession()
    import s.implicits._
    s.conf.set("spark.graft.rangeJoin.binWidth", "100")
    val points = s.range(0, 1000).select($"id".as("ts"), ($"id" % 7).as("v"))
    val intervals = Seq(
      (1L, 0L, 99L), (2L, 95L, 205L), (3L, 150L, 150L), (4L, 990L, 1200L),
    ).toDF("iid", "lo", "hi")
    val joined = points.join(intervals, $"ts" >= $"lo" && $"ts" <= $"hi")
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop"), s"rule did not fire:\n$p")
    assert(p.contains("Generate"), s"no bin replication in plan:\n$p")
    val got = joined.groupBy($"iid")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(Long, Long, Long)].collect().toSet
    // ground truth from an un-extended session's nested loop
    val s0 = TestSpark.spark
    import s0.implicits.{localSeqToDatasetHolder, newProductEncoder, StringToColumn}
    val pts0 = s0.range(0, 1000).select($"id".as("ts"), ($"id" % 7).as("v"))
    val iv0 = Seq(
      (1L, 0L, 99L), (2L, 95L, 205L), (3L, 150L, 150L), (4L, 990L, 1200L),
    ).toDF("iid", "lo", "hi")
    val expect = pts0.join(iv0, $"ts" >= $"lo" && $"ts" <= $"hi")
      .groupBy($"iid").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("rule handles intervals on the LEFT side too") {
    val s = freshSession()
    import s.implicits._
    s.conf.set("spark.graft.rangeJoin.binWidth", "50")
    val intervals = Seq((1L, 10L, 60L), (2L, 200L, 260L)).toDF("iid", "lo", "hi")
    val points = s.range(0, 300).select($"id".as("ts"))
    val joined = intervals.join(points, $"ts" >= $"lo" && $"ts" <= $"hi")
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && p.contains("Generate"), p)
    val counts = joined.groupBy($"iid").count()
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 51L, 2L -> 61L))
  }

  test("overflow guard (error mode): an interval spanning more than " +
    "maxBinsPerRow bins fails with an actionable message, not an " +
    "array-length blowup") {
    val s = freshSession()
    import s.implicits._
    s.conf.set("spark.graft.rangeJoin.binWidth", "10")
    s.conf.set("spark.graft.rangeJoin.maxBinsPerRow", "10")
    val points = s.range(0, 100).select($"id".as("ts"))
    val intervals = Seq((1L, 0L, 5000L)).toDF("iid", "lo", "hi") // 501 bins
    val joined = points.join(intervals, $"ts" >= $"lo" && $"ts" <= $"hi")
    val ex = intercept[Exception](joined.count())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("maxBinsPerRow")), ex.getMessage)
    // within the cap, same conf still rewrites and answers correctly
    val ok = points.join(Seq((1L, 10L, 60L)).toDF("iid", "lo", "hi"),
      $"ts" >= $"lo" && $"ts" <= $"hi")
    assert(ok.count() == 51)
  }

  test("overflow guard (catchall mode): oversized and open-ended " +
    "intervals stay exact via the catch-all bin; plan remains equi-join") {
    val s = freshSession()
    import s.implicits._
    s.conf.set("spark.graft.rangeJoin.binWidth", "10")
    s.conf.set("spark.graft.rangeJoin.maxBinsPerRow", "5")
    s.conf.set("spark.graft.rangeJoin.overflowMode", "catchall")
    val points = s.range(0, 500).select($"id".as("ts"), ($"id" % 5).as("v"))
    val intervals = Seq(
      (1L, 10L, 40L), // 4 bins: normal binned path
      (2L, 0L, 5000L), // 501 bins: catch-all
      (3L, 450L, Long.MaxValue), // open-ended sentinel: catch-all
      (4L, 600L, 9000L), // catch-all, matches nothing
    ).toDF("iid", "lo", "hi")
    val joined = points.join(intervals, $"ts" >= $"lo" && $"ts" <= $"hi")
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop"), s"rule did not fire:\n$p")
    val counts = joined.groupBy($"iid").count().as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 31L, 2L -> 500L, 3L -> 50L))
  }

  test("rule is inert without the binWidth conf and when an equi-conjunct " +
    "already exists") {
    val s = freshSession()
    import s.implicits._
    // no conf → untouched nested loop
    val pts = s.range(0, 100).select($"id".as("ts"))
    val iv = Seq((1L, 10L, 20L)).toDF("iid", "lo", "hi")
    val noConf = pts.join(iv, $"ts" >= $"lo" && $"ts" <= $"hi")
    assert(noConf.queryExecution.executedPlan.toString.contains("NestedLoop"))
    assert(noConf.count() == 11)

    s.conf.set("spark.graft.rangeJoin.binWidth", "100")
    // an equality conjunct means Spark already hash-joins: no Generate
    val ptsK = s.range(0, 100).select($"id".as("ts"), ($"id" % 3).as("k"))
    val ivK = Seq((0L, 10L, 20L)).toDF("k2", "lo", "hi")
    val equi = ptsK.join(ivK, $"k" === $"k2" && $"ts" >= $"lo" && $"ts" <= $"hi")
    assert(!equi.queryExecution.executedPlan.toString.contains("Generate"))
    assert(equi.count() == 3) // ts in 10..20 with ts % 3 == 0: 12, 15, 18
  }
}
