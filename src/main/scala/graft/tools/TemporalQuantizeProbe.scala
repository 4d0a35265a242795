package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: measure the `quantizeDepartures` lever on the bounded-wait
  * fastest composite at a given SF — wall time and final label mass
  * (the state the guard bounds) for exact vs quantized departures,
  * plus the duration error the coarsening actually costs. Rebuilds the
  * q_graph_temporal_bw_fastest setup (hand-off chain, W = 2 000 000 ms,
  * wait-respecting shortcuts).
  *
  * Usage: runMain graft.tools.TemporalQuantizeProbe <sfDir> [qMs...]
  */
object TemporalQuantizeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
      else Seq(600000L, 3600000L)
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val w = 2000000L
    val fe = graft.Tables(spark, dir).events
      .groupBy($"event_type", date_trunc("day", $"ts").as("bkt"), $"user_id")
      .agg(min($"ts").as("fts"), min($"event_id").as("feid"))
      .withColumn("ts_ms", unix_millis($"fts"))
    val chain = graft.operators.GraphAlgos.chainShortcuts(fe,
      partCols = Seq("event_type", "bkt"),
      ordCols = Seq("fts", "feid", "user_id"),
      nodeCol = "user_id", tsCol = "ts_ms", maxLevel = 12, maxWait = Some(w))
      .persist()
    val seed = chain.agg(min(least($"u", $"v"))).head.getLong(0)
    def run(q: Option[Long]): (Double, Long, Map[Long, Long]) = {
      val t0 = System.nanoTime()
      val out = graft.operators.GraphAlgos.temporalBoundedWaitFastest(
        chain, "u", "v", "dep", "arr", seed, w, quantizeDepartures = q)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (((System.nanoTime() - t0) / 1e9), out.size.toLong, out)
    }
    val (tExact, nExact, exact) = run(None)
    println(f"[probe] exact: ${tExact}%.1f s, $nExact nodes")
    qs.foreach { q =>
      val (tQ, nQ, coarse) = run(Some(q))
      require(coarse.keySet == exact.keySet, "reachability must stay exact")
      val errs = coarse.map { case (k, v) => v - exact(k) }
      require(errs.forall(e => e >= 0 && e < q), "duration bound violated")
      println(f"[probe] q=${q}ms: ${tQ}%.1f s (${tExact / tQ}%.2fx), " +
        f"$nQ nodes, max dur err ${errs.max}ms, " +
        f"mean err ${errs.sum.toDouble / errs.size}%.0f ms")
    }
  }
}
