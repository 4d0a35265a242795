package graft

import java.io.File

import org.apache.spark.sql.SparkSession

import graft.sources.FixtureLog

/** Dev tool (not part of the driver contract): like-for-like replay
  * throughput against the reference's one published number — "~2 mins
  * to replay 24h data on laptop", single-threaded decode→parse→book-
  * fold→Parquet (reference `README.md:78`). The sf-table bench queries
  * measure operators; this measures the reference's OWN workload
  * shape: 24 hourly `YYYY-MM-DD-HH.jsonl.zst` files pushed through the
  * full `cli replay` path end-to-end.
  *
  * Usage:
  *   runMain graft.ReplayThroughput gen <logDir> [framesPerFile] [nMarkets]
  *   runMain graft.ReplayThroughput run <logDir> <outDir>
  *       (parallelism = SPARK_GRAFT_CPUS, e.g. 1 for the reference's
  *        single-thread shape, 32 for the cluster-per-core shape)
  *
  * `gen` synthesizes 24 hour files with the deterministic fixture
  * generator (same wire format, every frame variant); `run` times one
  * cold end-to-end replay and prints a JSON line with wall seconds,
  * input bytes, frame count, and derived rates.
  */
object ReplayThroughput {

  def main(args: Array[String]): Unit = args.toList match {
    case "gen" :: dir :: rest =>
      val framesPerFile = rest.headOption.map(_.toInt).getOrElse(150000)
      val nMarkets = rest.drop(1).headOption.map(_.toInt).getOrElse(50)
      val spec = FixtureLog.Spec(dir = dir, nFiles = 24,
        framesPerFile = framesPerFile, nMarkets = nMarkets,
        assetsPerMarket = 2, seed = 1234L)
      val t0 = System.nanoTime()
      val paths = FixtureLog.write(spec)
      val bytes = paths.map(p => new File(p).length()).sum
      println(f"[gen] ${paths.size} files, $bytes%d zstd bytes, " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    case "run" :: dir :: out :: Nil =>
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors().toString)
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      val inBytes = files.map(_.length()).sum
      val t0 = System.nanoTime()
      cli.Main.run(spark, List("replay", "--in", dir, "--out", out))
      val secs = (System.nanoTime() - t0) / 1e9
      val nTicks = spark.read.parquet(out).count()
      println(f"""{"replay_24h_sec":$secs%.1f,"threads":$cpus,""" +
        f""""in_zstd_bytes":$inBytes,"out_ticks":$nTicks,""" +
        f""""mb_per_sec":${inBytes / 1e6 / secs}%.1f}""")
      spark.stop()
    case other => sys.error(s"usage: gen <dir> [fpf] [nMkts] | run <dir> <out>; got $other")
  }
}
