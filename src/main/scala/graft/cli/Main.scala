package graft.cli

import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.BookReplay
import graft.sources.{MarketsDim, RawLogSource, Sinks}

/** CLI entry points mirroring the reference binary's verbs (SURVEY.md
  * §3.1/§3.3; `cli/src/main.rs`):
  *
  * {{{
  * replay  --in DIR [--since 24h | --start TS [--end TS]]
  *         [-m MARKET]... [--out PATH] [--csv] [--partition-by-hour]
  * markets --in DIR [--earliest] [--filter SUBSTR] [--csv]
  * }}}
  *
  * `replay` is the reference's single-threaded decode→parse→fold→write
  * pipeline re-expressed as: pruned file listing → distributed scan →
  * one shuffle on asset → streaming fold → parquet/csv sink.
  */
object Main {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    try run(spark, args.toList)
    finally spark.stop()
  }

  def run(spark: SparkSession, args: List[String], now: Instant = Instant.now()): Unit =
    args match {
      case "replay" :: rest => replay(spark, parseOpts(rest), now)
      case "markets" :: rest => markets(spark, parseOpts(rest))
      case other =>
        sys.error(s"usage: (replay|markets) [options]; got: $other")
    }

  final case class Opts(
      flags: Set[String],
      values: Map[String, String],
      multi: Map[String, List[String]],
  ) {
    def get(k: String): Option[String] = values.get(k)
    def has(k: String): Boolean = flags(k)
    def all(k: String): List[String] = multi.getOrElse(k, Nil)
  }

  private val ValueOpts = Set("--in", "--since", "--start", "--end", "--out", "--filter")
  private val MultiOpts = Set("-m")

  private[cli] def parseOpts(args: List[String]): Opts = {
    def loop(rest: List[String], acc: Opts): Opts = rest match {
      case Nil => acc
      case k :: v :: t if ValueOpts(k) =>
        loop(t, acc.copy(values = acc.values + (k -> v)))
      case k :: v :: t if MultiOpts(k) =>
        loop(t, acc.copy(multi = acc.multi + (k -> (acc.multi.getOrElse(k, Nil) :+ v))))
      case k :: Nil if ValueOpts(k) || MultiOpts(k) =>
        // a value-taking option as the last token must fail loudly,
        // not degrade into a flag (a trailing `--out` would otherwise
        // silently replay to the default output path)
        sys.error(s"option $k requires a value")
      case k :: t if k.startsWith("-") =>
        loop(t, acc.copy(flags = acc.flags + k))
      case other :: _ => sys.error(s"unexpected argument: $other")
    }
    loop(args, Opts(Set.empty, Map.empty, Map.empty))
  }

  /** Hour-range from CLI options: `--since Δ` wins
    * (`[now-Δ, trunc_hour(now)-1min]`, `cli/src/main.rs:259-262`),
    * else optional `--start/--end` timestamps.
    */
  private[cli] def hourRange(o: Opts, now: Instant): (Option[String], Option[String]) =
    o.get("--since") match {
      case Some(d) =>
        val (a, b) = TimeArgs.sinceRange(TimeArgs.parseDuration(d), now)
        (Some(TimeArgs.hourKey(a)), Some(TimeArgs.hourKey(b)))
      case None =>
        (o.get("--start").map(s => TimeArgs.hourKey(TimeArgs.parseTs(s))),
          o.get("--end").map(s => TimeArgs.hourKey(TimeArgs.parseTs(s))))
    }

  private def replay(spark: SparkSession, o: Opts, now: Instant): Unit = {
    val dir = o.get("--in").getOrElse(sys.error("replay requires --in DIR"))
    val (startHour, endHour) = hourRange(o, now)
    val out = o.get("--out").getOrElse("output.parquet")
    val marketFilter = o.all("-m") match {
      case Nil => None
      case ms => Some(ms.toSet)
    }
    val msgs = RawLogSource.feedMessagesIn(spark, dir, startHour, endHour)
    val ticks = BookReplay.ticks(msgs, marketFilter)
    if (o.has("--csv"))
      Sinks.writeTicksCsvLegacy(
        BookReplay.referenceTicks(msgs, marketFilter), out)
    else if (o.has("--partition-by-hour"))
      Sinks.writeTicksParquet(ticks.toDF(), out, partitionByHour = true)
    else
      Sinks.writeTicksParquet(
        BookReplay.referenceTicks(msgs, marketFilter), out)
    println(s"[graft] replay written to $out")
  }

  private def markets(spark: SparkSession, o: Opts): Unit = {
    import spark.implicits._
    val dir = o.get("--in").getOrElse(sys.error("markets requires --in DIR"))
    val files = RawLogSource.discover(dir)
    require(files.nonEmpty, s"no log files in $dir")
    // latest file by default, earliest with --earliest
    // (`cli/src/main.rs:180-185`)
    val file = if (o.has("--earliest")) files.head else files.last
    val frames = RawLogSource.frames(spark, Seq(file))
    val ms = MarketsDim.markets(frames)
    val filtered = o.get("--filter") match {
      case Some(f) => ms.filter(lower($"question").contains(f.toLowerCase))
      case None => ms
    }
    // reference prints question,question_id,outcome,token_id
    // (`cli/src/main.rs:212-228`)
    val dim = MarketsDim.tokenDim(filtered)
      .select($"question", $"question_id", $"outcome", $"token_id")
    if (o.has("--csv")) {
      // header line matches the reference (`cli/src/main.rs:211`)
      println("question,question_id,outcome,token_id")
      dim.collect().foreach(r => println(r.mkString(",")))
    } else
      dim.show(1000, truncate = false)
  }
}
