package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The scoped-conf helpers' restore contract: every key they touch is
  * restored after the scope — on success AND on failure — because the
  * hand-rolled sites they replaced kept leaking `noDataMicroBatches`
  * session-wide (set-without-restore) across ~30 gates.
  */
class ScopedConfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val PartsKey = "spark.sql.shuffle.partitions"
  private val NoDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  test("withShufflePartitions: fixed override inside, restored after, " +
    "also when the body throws") {
    val before = spark.conf.get(PartsKey)
    ScopedConf.withShufflePartitions(spark, 3) {
      assert(spark.conf.get(PartsKey) == "3")
    }
    assert(spark.conf.get(PartsKey) == before)
    intercept[RuntimeException] {
      ScopedConf.withShufflePartitions(spark, 5)(throw new RuntimeException("x"))
    }
    assert(spark.conf.get(PartsKey) == before)
  }

  test("withStreamingGate: partitions + noDataMicroBatches set inside, " +
    "BOTH restored after — including a previously-customized noData value") {
    val beforeParts = spark.conf.get(PartsKey)
    spark.conf.set(NoDataKey, "false")
    try {
      ScopedConf.withStreamingGate(spark, "graft_scopedconf_spec_sink") {
        assert(spark.conf.get(PartsKey) == "8")
        assert(spark.conf.get(NoDataKey) == "true")
      }
      assert(spark.conf.get(PartsKey) == beforeParts)
      assert(spark.conf.get(NoDataKey) == "false",
        "the hand-rolled sites leaked this key; the helper must not")
    } finally spark.conf.unset(NoDataKey)
  }

  test("withStreamingGate: rocksDb pins the provider inside and restores " +
    "the session's previous value, also on failure") {
    val prev = spark.conf.getOption(ProviderKey)
    intercept[RuntimeException] {
      ScopedConf.withStreamingGate(
        spark, "graft_scopedconf_spec_sink", partitions = 2, rocksDb = true) {
        assert(spark.conf.get(PartsKey) == "2")
        assert(spark.conf.get(ProviderKey).contains("RocksDB"))
        throw new RuntimeException("x")
      }
    }
    assert(spark.conf.getOption(ProviderKey) == prev)
  }

  test("withStreamingGate stops an active query of the same sink name " +
    "before the body runs (warm-session re-run does not collide)") {
    val sinkName = "graft_scopedconf_spec_stream"
    val dir = java.nio.file.Files.createTempDirectory("scopedconf-src")
    java.nio.file.Files.write(dir.resolve("a.txt"), "x\n".getBytes)
    val q = spark.readStream.schema("value STRING").text(dir.toString)
      .writeStream.format("memory").queryName(sinkName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the finished-but-registered query must not break the next gate
    ScopedConf.withStreamingGate(spark, sinkName) {
      assert(!spark.streams.active.exists(x => Option(x.name).contains(sinkName)))
    }
    // and the previous run's sink view is gone
    intercept[org.apache.spark.sql.AnalysisException](spark.table(sinkName))
  }
}
