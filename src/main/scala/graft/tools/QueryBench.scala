package graft.tools

/** Single-query benchmark harness: graft.Bench's exact protocol
  * (sf0.001 warmup run, then min-of-3 timed noop-sink runs at the
  * target SF) for a NAMED SUBSET of the registry — the tool behind
  * the per-operator timings and sf1 decade rows in ARCHITECTURE.md,
  * where running the full 200+-query Bench sweep per iteration would
  * drown the signal.
  *
  * Usage: QueryBench <sfDir> [comma-separated query names]
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_graph_kcore_hindex")
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bench] $name min=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
  }
}
