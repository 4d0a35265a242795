package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one named query N times in a single JVM (same session
  * shape as Bench), printing each run — for isolating a single query's
  * cost from the full bench sweep and from host-load noise.
  *
  * Usage: runMain graft.TimeQuery <queryName> [sfDir] [nRuns]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    name.split(',').foreach { q =>
      val fn = SparkEntry.queries(q)
      // codegen warmup at the smallest SF (same plan text → cache hit)
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[warm] ${e.getMessage}") }
      // process-CPU per run alongside wall: on a host with hypervisor
      // steal, wall varies ±30% while the CPU the run actually burns is
      // stable — the honest A/B metric for plan-shape changes
      def cpuNs(): Long =
        java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
          case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
          case _ => 0L
        }
      (1 to n).foreach { i =>
        spark.catalog.clearCache()
        val c0 = cpuNs()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[time] $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          f"cpu=${(cpuNs() - c0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
