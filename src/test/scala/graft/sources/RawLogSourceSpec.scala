package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Scan-layer semantics over generated reference-format logs
  * (FIXTURES.md §1-2): stable line numbers, frame/message parsing,
  * PONG + unknown-event filtering, hour-range discovery, open-schema
  * market dim.
  */
class RawLogSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir =
    Files.createTempDirectory("graft_rawlog_spec").toString
  private lazy val spec = FixtureLog.Spec(dir = dir, nFiles = 3, framesPerFile = 80)
  private lazy val paths = FixtureLog.write(spec)

  test("fileHourOf parses the hour key from a path") {
    assert(RawLogSource.fileHourOf("/x/y/2025-07-01-14.jsonl.zst") == "2025-07-01-14")
  }

  test("discover prunes by hour range and sorts (S7/F4)") {
    paths // force write
    val all = RawLogSource.discover(dir)
    assert(all.size == 3 && all == all.sorted)
    val pruned = RawLogSource.discover(dir,
      startHour = Some("2025-07-01-11"), endHour = Some("2025-07-01-11"))
    assert(pruned.map(RawLogSource.fileHourOf) == Seq("2025-07-01-11"))
    assert(RawLogSource.discover(dir, startHour = Some("2025-07-01-12")).size == 1)
  }

  test("discover orders mixed legacy .bN and zero-padded .bNNNNNNNNN " +
    "batch files numerically within an hour") {
    val d = Files.createTempDirectory("graft_batch_order").toString
    // legacy names (pre-padding sink) interleaved with current names:
    // plain lexicographic order would put EVERY padded name before
    // EVERY legacy name ('0' < any digit)
    val names = Seq(
      "2025-07-01-10.b2.jsonl.zst",         // legacy batch 2
      "2025-07-01-10.b000000010.jsonl.zst", // padded batch 10
      "2025-07-01-10.b10.jsonl.zst",        // legacy batch 10 (dup id ok)
      "2025-07-01-10.b000000003.jsonl.zst", // padded batch 3
      "2025-07-01-11.b000000001.jsonl.zst", // later hour, earlier batch
      "2025-07-01-10.b1.jsonl.zst",         // legacy batch 1
    )
    names.foreach(n => Files.createFile(java.nio.file.Paths.get(d, n)))
    val got = RawLogSource.discover(d).map(p => p.substring(p.lastIndexOf('/') + 1))
    assert(got == Seq(
      "2025-07-01-10.b1.jsonl.zst",
      "2025-07-01-10.b2.jsonl.zst",
      "2025-07-01-10.b000000003.jsonl.zst",
      "2025-07-01-10.b000000010.jsonl.zst", // padded-vs-legacy tie on 10:
      "2025-07-01-10.b10.jsonl.zst",        // key-equal, input order kept
      "2025-07-01-11.b000000001.jsonl.zst",
    ) || got == Seq(
      "2025-07-01-10.b1.jsonl.zst",
      "2025-07-01-10.b2.jsonl.zst",
      "2025-07-01-10.b000000003.jsonl.zst",
      "2025-07-01-10.b10.jsonl.zst",
      "2025-07-01-10.b000000010.jsonl.zst",
      "2025-07-01-11.b000000001.jsonl.zst",
    ), s"got $got")
  }

  test("replayOrderKey re-pads ADJACENT batch segments (the terminator " +
    "dot is shared, so the match must not consume it)") {
    // `.b1.b2.` — the first segment's trailing dot IS the second's
    // leading dot; a consuming regex would leave `.b2.` lexicographic
    val k = RawLogSource.replayOrderKey("2025-07-01-10.b1.b2.jsonl.zst")
    assert(k == "2025-07-01-10.b" + "0" * 17 + "1.b" + "0" * 17 + "2.jsonl.zst", k)
  }

  test("frames: stable per-file line numbers, strict field decode") {
    val frames = RawLogSource.frames(spark, paths).collect()
    // one frame per written line
    assert(frames.length == 3 * (spec.framesPerFile + 3))
    val byFile = frames.groupBy(_.fileHour)
    assert(byFile.keySet == Set("2025-07-01-10", "2025-07-01-11", "2025-07-01-12"))
    byFile.values.foreach { fs =>
      val lines = fs.map(_.lineNo).sorted
      assert(lines.toSeq == (0L until fs.length).toSeq) // dense, zero-based
    }
    // first line after rotation is the dimension frame
    assert(byFile("2025-07-01-10").minBy(_.lineNo).messageType == "active_markets")
    assert(frames.forall(_.frameTs.nonEmpty))
    // object payloads preserved as JSON text
    val dim = frames.find(_.messageType == "active_markets").get
    assert(dim.content.startsWith("{") && dim.content.contains("\"markets\""))
  }

  test("feedMessages: PONG skipped (F5), unknown events dropped (F6)") {
    val frames = RawLogSource.frames(spark, paths)
    val raw = frames.collect()
    val nPong = raw.count(f => f.messageType == "feed_message" && f.content == "PONG")
    assert(nPong > 0, "fixture must contain PONGs")
    val msgs = RawLogSource.feedMessages(frames).collect()
    assert(msgs.nonEmpty)
    assert(msgs.forall(m => Set("book", "price_change", "last_trade_price")(m.eventType)))
    // no message came from a PONG or operational frame
    val feedLines = raw.filter(f =>
      f.messageType == "feed_message" && f.content != "PONG").map(f => (f.fileHour, f.lineNo)).toSet
    assert(msgs.forall(m => feedLines((m.fileHour, m.lineNo))))
    // double-encoded payload fields land typed
    val book = msgs.find(_.eventType == "book").get
    assert(book.asks.nonEmpty && book.asks.head.price.startsWith("0."))
    val trade = msgs.find(_.eventType == "last_trade_price").get
    assert(Set("BUY", "SELL")(trade.side) && trade.ts.forall(_.isDigit))
  }

  test("markets dim: typed core + open-schema remainder (S2/F1/F7)") {
    val frames = RawLogSource.frames(spark, paths.take(1))
    val ms = MarketsDim.markets(frames).collect()
    assert(ms.nonEmpty)
    assert(ms.forall(_.other_json.contains("neg_risk"))) // unmodeled key kept
    assert(ms.forall(_.tokens.forall(_.other_json.contains("extra_tag"))))
    // F1: the fixture's last market is closed -> filtered out
    val active = MarketsDim.activeMarkets(
      MarketsDim.markets(frames)).collect()
    assert(active.map(_.condition_id).toSet == Set("0xM0"))
    // F7: token dim of ACTIVE markets only
    val dim = MarketsDim.tokenDim(MarketsDim.activeMarkets(MarketsDim.markets(frames))).collect()
    assert(dim.map(_.getAs[String]("token_id")).sorted.toSeq == Seq("A0", "A1"))
    assert(dim.map(_.getAs[String]("outcome")).sorted.toSeq == Seq("No", "Yes"))
  }

  test("full pipeline ticks are deterministic across reads") {
    val t1 = graft.operators.BookReplay
      .referenceTicks(RawLogSource.feedMessages(RawLogSource.frames(spark, paths)))
      .collect().toSeq
    val t2 = graft.operators.BookReplay
      .referenceTicks(RawLogSource.feedMessages(RawLogSource.frames(spark, paths)))
      .collect().toSeq
    assert(t1 == t2 && t1.nonEmpty)
  }
}
