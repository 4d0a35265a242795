package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: measure the [[graft.operators.GraphAlgos.chainShortcuts]]
  * round collapse on the all-nodes temporal ANF
  * ([[graft.operators.GraphAlgos.temporalAnfReach]]) at a given SF —
  * the operator's cost floor is job overhead × rounds once the payload
  * shape is per-(node, breakpoint), so the shortcut chain's O(log L)
  * rounds vs the base chain's O(L) is the remaining wall-clock lever.
  * Verifies the fixpoint is register-identical between the two edge
  * sets (shortcuts are exact composites) before reporting.
  *
  * Usage: runMain graft.tools.AnfRoundsProbe <sfDir> [registerWidth]
  */
object AnfRoundsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val width = if (args.length > 1) args(1).toInt else 512
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val fe = graft.Tables(spark, dir).events
      .groupBy($"event_type", date_trunc("day", $"ts").as("bkt"), $"user_id")
      .agg(min($"ts").as("fts"), min($"event_id").as("feid"))
      .withColumn("ts_ms", unix_millis($"fts"))
      .persist()
    fe.count()
    def run(maxLevel: Int): (Double, Int, Map[Long, Long]) = {
      val chain = graft.operators.GraphAlgos.chainShortcuts(fe,
        partCols = Seq("event_type", "bkt"),
        ordCols = Seq("fts", "feid", "user_id"),
        nodeCol = "user_id", tsCol = "ts_ms", maxLevel = maxLevel)
      val rounds = new java.util.concurrent.atomic.AtomicInteger(-1)
      val t0 = System.nanoTime()
      val sums = graft.operators.GraphAlgos.temporalAnfReach(
        chain, "u", "v", "dep", "arr", maxIters = 256,
        registerWidth = width, roundsOut = Some(rounds))
        .select($"node", call_function(
          graft.functions.HllRegistersM.EvalName, $"regs")
          .getField("register_sum_scaled").as("rs"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      ((System.nanoTime() - t0) / 1e9, rounds.get(), sums)
    }
    val (tShort, rShort, sShort) = run(12)
    println(f"[probe] shortcuts maxLevel=12: ${tShort}%.1f s, $rShort rounds, ${sShort.size} nodes")
    val (tBase, rBase, sBase) = run(0)
    println(f"[probe] base edges  maxLevel=0: ${tBase}%.1f s, $rBase rounds, ${sBase.size} nodes")
    require(sBase == sShort, "fixpoint register sums differ — shortcut soundness broken")
    println(f"[probe] collapse: $rBase -> $rShort rounds (${rBase.toDouble / rShort}%.1fx), " +
      f"wall ${tBase}%.1f -> ${tShort}%.1f s (${tBase / tShort}%.2fx), fixpoint identical")
  }
}
