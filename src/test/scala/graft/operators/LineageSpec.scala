package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The opt-in reliable-checkpoint path for iterative graph loops:
  * `spark.graft.graph.reliableCheckpoint=true` switches every
  * per-round lineage cut from executor-local blocks (lost with an
  * executor) to `checkpoint()` files under
  * `spark.graft.graph.checkpointDir` — identical results, real files
  * on the fault-tolerant store.
  */
class LineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withReliable[T](dir: String)(body: => T): T = {
    spark.conf.set(Lineage.ReliableKey, "true")
    spark.conf.set(Lineage.DirKey, dir)
    try body
    finally {
      spark.conf.set(Lineage.ReliableKey, "false")
      spark.conf.unset(Lineage.DirKey)
    }
  }

  test("a full iterative loop under the reliable path matches the default " +
    "path and writes real checkpoint files") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 4L), (2L, 6L)).toDF("u", "v")
    val expected = GraphAlgos.coreNumbers(edges, "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ckDir = java.nio.file.Files.createTempDirectory("graft_reliable_ck").toString
    val got = withReliable(ckDir) {
      GraphAlgos.coreNumbers(edges, "u", "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(got === expected)
    // the rounds actually went through the reliable store: RDD
    // checkpoint files exist under the configured dir
    def countFiles(f: java.io.File): Int =
      Option(f.listFiles()).getOrElse(Array.empty)
        .map(c => if (c.isDirectory) countFiles(c) else 1).sum
    assert(countFiles(new java.io.File(ckDir)) > 0,
      s"expected checkpoint files under $ckDir")
  }

  test("reliable=true without a checkpoint dir fails loudly") {
    // a fresh context-level dir may linger from the previous test; the
    // guard only fires when NEITHER the conf nor the context has one —
    // simulate the cold-start case on a throwaway check
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      spark.conf.set(Lineage.ReliableKey, "true")
      try {
        val ex = intercept[IllegalArgumentException] {
          Lineage.cut(Seq((1L, 2L)).toDF("a", "b"))
        }
        assert(ex.getMessage.contains(Lineage.DirKey))
      } finally spark.conf.set(Lineage.ReliableKey, "false")
    } else succeed
  }

  test("settle drops origin stats: the size estimate's bit-length stays " +
    "flat across an iterated self-join loop (checkpointing alone lets the " +
    "BigInt estimate COMPOUND until stats estimation eats the driver)") {
    var df = Lineage.settle(Seq((1L, 1L), (2L, 2L)).toDF("node", "c"))
    for (_ <- 1 to 8) {
      df = Lineage.settle(
        df.as("a").join(df.as("b"), Seq("node"))
          .select($"node", ($"a.c" + $"b.c").as("c")))
    }
    val bits = df.queryExecution.optimizedPlan.stats.sizeInBytes
      .bigInteger.bitLength
    assert(bits <= 70,
      s"estimate bit-length $bits — origin stats are compounding through the loop")
    assert(df.collect().map(_.getLong(0)).sorted === Array(1L, 2L))
  }
}
