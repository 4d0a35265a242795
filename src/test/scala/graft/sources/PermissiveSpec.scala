package graft.sources

import java.io.{File, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.github.luben.zstd.ZstdOutputStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Malformed-line handling: strict mode fails like the reference,
  * permissive mode quarantines (SURVEY.md §7.4 risk 3).
  */
class PermissiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_permissive").toString
    val out = new OutputStreamWriter(
      new ZstdOutputStream(new FileOutputStream(new File(d, "2025-07-01-10.jsonl.zst"))),
      StandardCharsets.UTF_8)
    out.write(
      """{"timestamp":"2025-07-01T10:00:00+00:00","message_type":"feed_message","content":"[{\"event_type\":\"last_trade_price\",\"asset_id\":\"A1\",\"market\":\"0xM1\",\"timestamp\":\"1751378400000\",\"side\":\"BUY\",\"price\":\"0.5\",\"size\":\"1\"}]"}""" + "\n")
    out.write("this is not json {{{\n")
    out.write(
      """{"timestamp":"2025-07-01T10:00:02+00:00","message_type":"all_connections_ready","content":{"connection_count":1,"markets_count":1}}""" + "\n")
    out.close()
    d
  }

  test("strict mode: malformed line fails the job (reference parity)") {
    val ex = intercept[org.apache.spark.SparkException] {
      RawLogSource.frames(spark, RawLogSource.discover(dir)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("feed strictness: missing required field raises in strict, drops in permissive") {
    import spark.implicits._
    val frames = Seq(
      graft.model.Frame("2025-07-01-10", 0L, "2025-07-01T10:00:00+00:00", "feed_message",
        """[{"event_type":"last_trade_price","asset_id":"A1","market":"0xM1","timestamp":"1751378400000","side":"BUY","price":"0.5"}]"""),
      graft.model.Frame("2025-07-01-10", 1L, "2025-07-01T10:00:01+00:00", "feed_message",
        """[{"event_type":"last_trade_price","asset_id":"A1","market":"0xM1","timestamp":"1751378401000","side":"SELL","price":"0.6","size":"2"}]"""),
    ).toDS()
    // strict (default): the size-less trade is an error, like serde
    val ex = intercept[Exception] {
      RawLogSource.feedMessages(frames).collect()
    }
    assert(ex.getMessage.contains("malformed feed message") ||
      Option(ex.getCause).exists(_.getMessage.contains("malformed feed message")))
    // permissive: it is dropped, the valid trade survives
    val ok = RawLogSource.feedMessages(frames, strict = false).collect()
    assert(ok.map(_.size).toSeq == Seq("2"))
  }

  test("gate rejects known events missing asset_id/market/timestamp " +
    "and diffs with invalid change sides (serde-required fields)") {
    import spark.implicits._
    def feed(lineNo: Long, msg: String) =
      graft.model.Frame("2025-07-01-10", lineNo,
        s"2025-07-01T10:00:0$lineNo+00:00", "feed_message", s"[$msg]")
    val frames = Seq(
      // no asset_id: previously flowed into the fold where a null key
      // NPE'd the whole partition (ADVICE r1, medium)
      feed(0,
        """{"event_type":"book","market":"0xM1","timestamp":"1751378400000","asks":[],"bids":[]}"""),
      // no timestamp
      feed(1,
        """{"event_type":"price_change","asset_id":"A1","market":"0xM1","changes":[{"price":"0.5","size":"1","side":"BUY"}]}"""),
      // change side neither BUY nor SELL: serde's Side enum rejects it
      feed(2,
        """{"event_type":"price_change","asset_id":"A1","market":"0xM1","timestamp":"1751378402000","changes":[{"price":"0.5","size":"1","side":"HOLD"}]}"""),
      // well-formed control message
      feed(3,
        """{"event_type":"price_change","asset_id":"A1","market":"0xM1","timestamp":"1751378403000","changes":[{"price":"0.5","size":"1","side":"BUY"}]}"""),
    ).toDS()
    intercept[Exception](RawLogSource.feedMessages(frames).collect())
    val kept = RawLogSource.feedMessages(frames, strict = false).collect()
    assert(kept.map(_.lineNo).toSeq == Seq(3L))
    // the surviving pipeline folds cleanly (no null-asset NPE)
    val ticks = graft.operators.BookReplay
      .ticks(RawLogSource.feedMessages(frames, strict = false))
      .collect()
    assert(ticks.length == 2 && ticks.forall(_.asset == "A1"))
  }

  test("property: permissive gate keeps exactly the serde-valid messages " +
    "and strict raises iff any message is invalid (200 randomized msgs)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def maybe(s: String): Option[String] = if (rnd.nextBoolean()) Some(s) else None
    // random messages with randomly missing/invalid required fields
    val msgs: Seq[(Long, String, Boolean)] = (0 until 200).map { i =>
      val et = Seq("last_trade_price", "book", "price_change")(rnd.nextInt(3))
      val asset = maybe("\"asset_id\":\"A1\"")
      val market = maybe("\"market\":\"0xM1\"")
      val ts = maybe(s""""timestamp":"${1751378400000L + i}"""")
      val side = Seq(Some("BUY"), Some("SELL"), Some("HOLD"), None)(rnd.nextInt(4))
      val price = maybe("\"price\":\"0.5\"")
      val size = maybe("\"size\":\"2\"")
      val sides = maybe("\"asks\":[{\"price\":\"0.6\",\"size\":\"1\"}],\"bids\":[]")
      val changes = maybe(
        s"""\"changes\":[{\"price\":\"0.5\",\"size\":\"1\",\"side\":\"${side.getOrElse("BUY")}\"}]""")
      val fields = (Seq(Some(s""""event_type":"$et""""), asset, market, ts) ++ (et match {
        case "last_trade_price" =>
          Seq(side.map(s => s""""side":"$s""""), price, size)
        case "book" => Seq(sides)
        case _ => Seq(changes)
      })).flatten
      val common = asset.isDefined && market.isDefined && ts.isDefined
      val valid = common && (et match {
        case "last_trade_price" =>
          side.exists(s => s == "BUY" || s == "SELL") && price.isDefined && size.isDefined
        case "book" => sides.isDefined
        case _ => changes.isDefined && side.forall(s => s == "BUY" || s == "SELL")
      })
      (i.toLong, fields.mkString("{", ",", "}"), valid)
    }
    val frames = msgs.map { case (i, m, _) =>
      graft.model.Frame("2025-07-01-10", i, "2025-07-01T10:00:00+00:00",
        "feed_message", s"[$m]")
    }.toDS()
    val keptLineNos = RawLogSource.feedMessages(frames, strict = false)
      .collect().map(_.lineNo).toSet
    val expected = msgs.filter(_._3).map(_._1).toSet
    assert(keptLineNos == expected)
    val anyInvalid = msgs.exists(!_._3)
    if (anyInvalid)
      intercept[Exception](RawLogSource.feedMessages(frames).collect())
    else RawLogSource.feedMessages(frames).collect()
  }

  test("permissive mode: malformed line quarantined, pipeline unaffected") {
    val frames = RawLogSource
      .frames(spark, RawLogSource.discover(dir), permissive = true)
      .collect()
    assert(frames.length == 3)
    val corrupt = frames.filter(_.messageType == RawLogSource.CorruptType)
    assert(corrupt.length == 1 && corrupt.head.lineNo == 1)
    assert(corrupt.head.content.startsWith("this is not json"))
    // downstream feed parse simply never sees the corrupt frame
    val msgs = RawLogSource.feedMessages(
      RawLogSource.frames(spark, RawLogSource.discover(dir), permissive = true))
    assert(msgs.collect().map(_.eventType).toSeq == Seq("last_trade_price"))
  }
}
