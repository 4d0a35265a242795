package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: print `explain("formatted")` and a timing for the
  * [[graft.operators.GraphAlgos.chainShortcuts]] edge frame itself —
  * the one shared subplan of the whole temporal gate family that never
  * appears in a gate's FINAL plan (the frontier loops consume it
  * before the readout the gates return), so the plan-audit loop needs
  * a direct window on it. Used for the round-14 before/after evidence
  * on the union-of-levels → explode rewrite (`plans/r14/`).
  *
  * Usage: runMain graft.tools.ChainPlanProbe [sfDir] [maxWait] [slack]
  */
object ChainPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val maxWait = if (args.length > 1) Some(args(1).toLong).filter(_ > 0) else None
    val slack = if (args.length > 2) Some(args(2).toLong).filter(_ > 0) else None
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val fe = graft.Tables(spark, dir).events
      .groupBy($"event_type", date_trunc("day", $"ts").as("bkt"), $"user_id")
      .agg(min($"ts").as("fts"), min($"event_id").as("feid"))
      .withColumn("ts_ms", unix_millis($"fts"))
      .persist()
    fe.count()
    val chain = graft.operators.GraphAlgos.chainShortcuts(fe,
      partCols = Seq("event_type", "bkt"),
      ordCols = Seq("fts", "feid", "user_id"),
      nodeCol = "user_id", tsCol = "ts_ms", maxLevel = 12,
      maxWait = maxWait, arrivalSlack = slack)
    chain.explain("formatted")
    // min-of-3 wall for the chain alone (noop sink — guide §1.4)
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      chain.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[chain] rows=${chain.count()} " +
      f"min3=${times.min}%.2f s runs=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
