package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{Change, FeedMsg, Level, Tick}

/** The modern-state-API fold (`transformWithState` + ValueState with
  * native TTL) must match the flatMapGroupsWithState fold row for row,
  * and its TTL must evict dead-asset books without timer bookkeeping.
  */
class TransformWithStateSpec extends AnyFunSuite {

  private def rocksSession() = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  private def msg(
      lineNo: Long,
      eventType: String,
      asset: String = "A1",
      side: String = null,
      price: String = null,
      size: String = null,
      asks: Seq[Level] = null,
      bids: Seq[Level] = null,
      changes: Seq[Change] = null,
  ): FeedMsg =
    FeedMsg("2025-07-01-14", lineNo, 0, eventType, "0xM1", asset,
      ts = (1751378400000L + lineNo * 1000).toString,
      side = side, price = price, size = size,
      asks = asks, bids = bids, changes = changes)

  private def brief(t: Tick) = (t.asset, t.kind, t.side, t.price, t.size, t.line_no)

  test("transformWithState fold equals the flatMapGroupsWithState fold " +
    "across micro-batches (state carryover parity)") {
    val s = rocksSession()
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val batch1 = Seq(
      msg(0, "book", asset = "A1",
        asks = Seq(Level("0.55", "100")), bids = Seq(Level("0.52", "40"))),
      msg(1, "book", asset = "B1",
        asks = Seq(Level("0.70", "1")), bids = Seq(Level("0.30", "2"))))
    val batch2 = Seq(
      msg(2, "price_change", asset = "A1",
        changes = Seq(Change("0.55", "0", "SELL"))),
      msg(3, "last_trade_price", asset = "B1",
        side = "SELL", price = "0.31", size = "7"))

    def run(name: String, mk: org.apache.spark.sql.Dataset[FeedMsg] => org.apache.spark.sql.Dataset[Tick]): Seq[(String, String, String, Double, Double, Long)] = {
      val input = MemoryStream[FeedMsg]
      val q = mk(input.toDS()).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      q.stop()
      s.table(name).as[Tick].collect().toSeq
        .sortBy(t => (t.asset, t.line_no, t.emit_idx)).map(brief)
    }

    val tws = run("tws_parity", ds => StreamingReplay.ticksStreamTWS(ds))
    val fmg = run("fmg_parity", ds => StreamingReplay.ticksStream(ds))
    assert(tws.nonEmpty && tws == fmg)
  }

  test("native ValueState TTL: a dead asset's book expires (reads as " +
    "absent), a live one's survives — no timer branch needed") {
    val s = rocksSession()
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[FeedMsg]
    // TimeMode.ProcessingTime (required for TTL) makes the engine run
    // batches every trigger interval, so processAllAvailable never
    // observes quiescence (same engine behavior as
    // GroupStateTimeout.ProcessingTimeTimeout — see LiveIngestSpec):
    // give the spin a real cadence and poll the sink instead.
    val q = StreamingReplay
      .ticksStreamTWS(input.toDS(), stateTtl = Some(java.time.Duration.ofSeconds(2)))
      .writeStream.format("memory").queryName("tws_ttl").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def awaitRows(n: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (s.table("tws_ttl").count() < n) {
        assert(System.nanoTime() < deadline, s"timed out waiting for $n sink rows")
        assert(q.exception.isEmpty, s"query died: ${q.exception}")
        Thread.sleep(50)
      }
    }

    input.addData(msg(0, "book", asset = "A1",
      asks = Seq(Level("0.60", "10")), bids = Seq(Level("0.50", "20"))))
    awaitRows(2)
    Thread.sleep(3000) // past the 2s TTL: A1's value expires in place
    input.addData(msg(1, "book", asset = "B1",
      asks = Seq(Level("0.70", "1")), bids = Seq(Level("0.30", "2"))))
    awaitRows(4)
    // A1's next diff folds against a FRESH book; B1 (inside TTL) keeps its book
    input.addData(
      msg(2, "price_change", asset = "A1",
        changes = Seq(Change("0.55", "5", "SELL"))),
      msg(3, "price_change", asset = "B1",
        changes = Seq(Change("0.30", "0", "BUY"))))
    awaitRows(8)
    q.stop()

    val out = s.table("tws_ttl").as[Tick].collect().toSeq
      .sortBy(t => (t.line_no, t.emit_idx))
      .map(t => (t.asset, t.kind, t.side, t.price, t.size))
    assert(out == Seq(
      ("A1", "BBO", "ASK", 0.60, 10.0),
      ("A1", "BBO", "BID", 0.50, 20.0),
      ("B1", "BBO", "ASK", 0.70, 1.0),
      ("B1", "BBO", "BID", 0.30, 2.0),
      ("A1", "BBO", "ASK", 0.55, 5.0),
      ("A1", "BBO", "BID", 0.0, 0.0), // expired: pre-TTL bid NOT visible
      ("B1", "BBO", "ASK", 0.70, 1.0),
      ("B1", "BBO", "BID", 0.0, 0.0), // survived: diff deleted the live bid
    ))
  }
}
