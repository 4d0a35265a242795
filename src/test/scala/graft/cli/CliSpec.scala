package graft.cli

import java.io.File
import java.nio.file.Files
import java.time.{Duration, Instant}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.{FixtureLog, RawLogSource, Sinks}

/** CLI verbs, time-arg parsing, and sink round-trips. */
class CliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_cli_spec").toString
    FixtureLog.write(FixtureLog.Spec(dir = d, nFiles = 2, framesPerFile = 60))
    d
  }

  test("parseTs: rfc3339, iso-no-offset, date-only fallbacks (C1)") {
    assert(TimeArgs.parseTs("2025-07-01T14:30:00+02:00") ==
      Instant.parse("2025-07-01T12:30:00Z"))
    assert(TimeArgs.parseTs("2025-07-01T14:30:00") ==
      Instant.parse("2025-07-01T14:30:00Z"))
    assert(TimeArgs.parseTs("2025-07-01") == Instant.parse("2025-07-01T00:00:00Z"))
    intercept[Exception](TimeArgs.parseTs("not-a-time"))
  }

  test("parseDuration + sinceRange (C2/C3)") {
    assert(TimeArgs.parseDuration("90s") == Duration.ofSeconds(90))
    assert(TimeArgs.parseDuration("12h") == Duration.ofHours(12))
    assert(TimeArgs.parseDuration("2d") == Duration.ofDays(2))
    intercept[IllegalArgumentException](TimeArgs.parseDuration("12x"))
    val now = Instant.parse("2025-07-01T14:37:21Z")
    val (a, b) = TimeArgs.sinceRange(Duration.ofHours(2), now)
    assert(a == Instant.parse("2025-07-01T12:37:21Z"))
    assert(b == Instant.parse("2025-07-01T13:59:00Z")) // trunc hour - 1min
    assert(TimeArgs.hourKey(now) == "2025-07-01-14")
  }

  test("parseOpts: values, repeated -m, flags, unexpected args") {
    val o = Main.parseOpts(List(
      "--in", "/x", "-m", "0xA", "-m", "0xB", "--csv", "--since", "24h"))
    assert(o.get("--in").contains("/x"))
    assert(o.all("-m") == List("0xA", "0xB"))
    assert(o.has("--csv") && !o.has("--earliest"))
    assert(o.get("--since").contains("24h"))
    intercept[RuntimeException](Main.parseOpts(List("stray")))
  }

  test("download verb: dry run reports the cache partition; --from fills " +
    "the cache from a mirror and is idempotent") {
    val src = Files.createTempDirectory("graft_dl_src").toString
    val cache = Files.createTempDirectory("graft_dl_cache").toString
    FixtureLog.write(FixtureLog.Spec(dir = src, nFiles = 2, framesPerFile = 10))
    // fixture hours are 2025-07-01-10/11
    val range = List("--start", "2025-07-01T10:00:00", "--end", "2025-07-01T11:30:00")
    Main.run(spark, "download" :: "--in" :: cache :: range) // dry run, no copy
    assert(RawLogSource.discover(cache).isEmpty)
    Main.run(spark, "download" :: "--in" :: cache :: "--from" :: src :: range)
    assert(RawLogSource.discover(cache).map(RawLogSource.fileHourOf) ==
      Seq("2025-07-01-10", "2025-07-01-11"))
    // re-running downloads nothing new (cache hit)
    Main.run(spark, "download" :: "--in" :: cache :: "--from" :: src :: range)
    assert(RawLogSource.discover(cache).size == 2)
    // a replay over the downloaded cache works end-to-end
    val out = Files.createTempDirectory("graft_dl_out").toString + "/ticks"
    Main.run(spark, List("replay", "--in", cache, "--out", out))
    assert(spark.read.parquet(out).count() > 0)
  }

  test("markets --raw prints the dimension frame's raw JSON") {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos)) {
      Main.run(spark, List("markets", "--in", dir, "--raw"))
    }
    val printed = bos.toString("UTF-8").trim
    assert(printed.startsWith("{") && printed.contains("\"markets\""))
    assert(printed.contains("\"condition_id\":\"0xM0\""))
  }

  test("parseOpts: value-taking option with no value is an error, not a flag") {
    val exOut = intercept[RuntimeException](
      Main.parseOpts(List("--in", "/x", "--out")))
    assert(exOut.getMessage.contains("--out requires a value"))
    val exM = intercept[RuntimeException](Main.parseOpts(List("-m")))
    assert(exM.getMessage.contains("-m requires a value"))
  }

  test("hourRange: --since wins over --start/--end; explicit bounds parse") {
    val now = Instant.parse("2025-07-01T14:37:21Z")
    val both = Main.hourRange(Main.parseOpts(List(
      "--since", "2h", "--start", "2020-01-01")), now)
    assert(both == ((Some("2025-07-01-12"), Some("2025-07-01-13"))))
    val explicit = Main.hourRange(Main.parseOpts(List(
      "--start", "2025-07-01T10:00:00", "--end", "2025-07-01T12:30:00")), now)
    assert(explicit == ((Some("2025-07-01-10"), Some("2025-07-01-12"))))
    assert(Main.hourRange(Main.parseOpts(Nil), now) == ((None, None)))
  }

  test("replay verb writes reference-schema parquet") {
    val out = Files.createTempDirectory("graft_cli_out").toString + "/ticks"
    Main.run(spark, List("replay", "--in", dir, "--out", out))
    val df = spark.read.parquet(out)
    assert(df.columns.toSeq ==
      Seq("timestamp", "kind", "market", "asset", "side", "price", "size"))
    assert(df.count() > 0)
  }

  test("replay verb with market filter and csv output (K4 legacy sides)") {
    val out = Files.createTempDirectory("graft_cli_out").toString + "/ticks_csv"
    Main.run(spark, List("replay", "--in", dir, "-m", "0xM0", "--csv", "--out", out))
    val df = spark.read.option("header", "true").csv(out)
    assert(df.count() > 0)
    val sides = df.select("side").distinct().collect().map(_.getString(0)).toSet
    assert(sides.subsetOf(Set("BUY", "SELL"))) // legacy CSV side names
    assert(df.select("market").distinct().collect().map(_.getString(0)).toSet == Set("0xM0"))
  }

  test("replay --partition-by-hour writes hour-partitioned layout") {
    val out = Files.createTempDirectory("graft_cli_out").toString + "/ticks_part"
    Main.run(spark, List("replay", "--in", dir, "--partition-by-hour", "--out", out))
    val dirs = new File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("file_hour=2025-07-01-10", "file_hour=2025-07-01-11"))
    // partition pruning: reading one hour touches only that directory
    val one = spark.read.parquet(out).filter(org.apache.spark.sql.functions.col("file_hour") === "2025-07-01-10")
    assert(one.count() > 0)
    val scanned = one.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters"))
  }

  test("replay --since prunes to an empty range cleanly") {
    val out = Files.createTempDirectory("graft_cli_out").toString + "/none"
    // fixture hours are 2025-07-01-{10,11}; a --since window in 2026
    // must select no files
    intercept[IllegalArgumentException] {
      Main.run(spark, List("replay", "--in", dir, "--since", "2h", "--out", out),
        now = Instant.parse("2026-01-01T00:00:00Z"))
    }
  }

  test("markets verb lists the dim from the chosen file") {
    // smoke: runs end-to-end and prints; earliest vs latest both valid
    Main.run(spark, List("markets", "--in", dir, "--csv"))
    Main.run(spark, List("markets", "--in", dir, "--earliest", "--csv", "--filter", "fixture"))
  }

  test("markets --since honors the injected clock like replay/download") {
    // fixture hours are 2025-07-01-{10,11}: a 2h window ending at 11:30
    // selects hour 10; the same window under a 2026 clock selects none.
    // (markets used to call Instant.now() directly, making --since
    // nondeterministic regardless of the `now` threaded through run().)
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos)) {
      Main.run(spark, List("markets", "--in", dir, "--since", "2h", "--csv"),
        now = Instant.parse("2025-07-01T11:30:00Z"))
    }
    assert(bos.toString("UTF-8").contains("Fixture question 0?"))
    intercept[IllegalArgumentException] {
      Main.run(spark, List("markets", "--in", dir, "--since", "2h"),
        now = Instant.parse("2026-01-01T00:00:00Z"))
    }
  }

  test("K2 round-trip: frames -> jsonl.zst -> frames") {
    val orig = RawLogSource.frames(spark, RawLogSource.discover(dir))
    val outDir = Files.createTempDirectory("graft_k2").toString
    Sinks.writeFramesJsonlZst(orig, outDir)
    val files = RawLogSource.discover(outDir)
    assert(files.map(RawLogSource.fileHourOf) ==
      Seq("2025-07-01-10", "2025-07-01-11"))
    val back = RawLogSource.frames(spark, files)
    val a = orig.collect().sortBy(f => (f.fileHour, f.lineNo))
    val b = back.collect().sortBy(f => (f.fileHour, f.lineNo))
    assert(a.length == b.length)
    (a zip b).foreach { case (x, y) =>
      assert(x.messageType == y.messageType)
      assert(x.frameTs == y.frameTs)
      // feed/string content must round-trip byte-identically
      if (x.messageType == "feed_message") assert(x.content == y.content)
    }
  }
}
