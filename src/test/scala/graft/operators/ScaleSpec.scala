package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Salting correctness + bucketed co-located join plan shape. */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedSumCount equals plain groupBy on a skewed key") {
    // 90% of rows share one key
    val df = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(0L).as("k"),
        ($"id" % 100).cast("double").as("v"))
    val plain = df.groupBy($"k".as("key"))
      .agg(sum($"v").as("sum"), count($"v").as("cnt"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Scale.saltedSumCount(df, $"k", $"v", 16)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join on a skewed fact key") {
    val fact = spark.range(5000)
      .select(when($"id" % 100 === 0, $"id" % 5).otherwise(1L).as("k"), $"id".as("x"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e")).toDF("k", "label")
    val plain = fact.join(dim, "k").groupBy($"label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedJoin(fact, dim, "k", 8).groupBy($"label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("requireAllPairsBounded throws on an oversized input and passes " +
    "a bounded one through unchanged") {
    val big = spark.range(500).toDF("vec_id")
    spark.conf.set("spark.graft.allPairsMaxRows", "100")
    try {
      val e = intercept[IllegalArgumentException] {
        Scale.requireAllPairsBounded(big, "test_baseline")
      }
      assert(e.getMessage.contains("all-pairs") &&
        e.getMessage.contains("blocked"),
        s"guard error should name the scale path: ${e.getMessage}")
      spark.conf.set("spark.graft.allPairsMaxRows", "1000")
      assert(Scale.requireAllPairsBounded(big, "test_baseline").count() == 500)
    } finally {
      spark.conf.unset("spark.graft.allPairsMaxRows")
      big.unpersist()
    }
  }

  test("bucketed tables co-locate: the bucket join plans without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val a = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("va"))
      val b = spark.range(1000).select($"id".as("k"), ($"id" * 3).as("vb"))
      a.write.mode("overwrite")
        .option("path", s"$wh/ta").bucketBy(8, "k").sortBy("k").saveAsTable("graft_ta")
      b.write.mode("overwrite")
        .option("path", s"$wh/tb").bucketBy(8, "k").sortBy("k").saveAsTable("graft_tb")
      val joined = spark.table("graft_ta").join(spark.table("graft_tb"), "k")
      val physical = joined.queryExecution.executedPlan.toString
      // both sides read pre-bucketed data: no Exchange anywhere
      assert(!physical.contains("Exchange"), s"unexpected shuffle:\n$physical")
      assert(joined.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ta")
      spark.sql("DROP TABLE IF EXISTS graft_tb")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
