package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode defaults are tuned for the test harness (local[32],
  * 128 GiB single JVM) but every setting here is what we would ship to a
  * real cluster too: AQE on (runtime re-planning, skew-join splitting,
  * partition coalescing), UTC session time, shuffle partitions sized to
  * the parallelism at hand rather than the 200 default.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      // the full native surface (fnv63, sketch aggregates, register
      // algebra, replay_book TVF, range-join binning rule) rides the
      // declarative extensions route, so plain spark.sql text can call
      // everything without imperative register() calls; a cluster
      // deployment sets spark.sql.extensions=graft.functions.GraftExtensions
      .withExtensions(new graft.functions.GraftExtensions())
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
