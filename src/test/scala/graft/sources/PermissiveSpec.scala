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
