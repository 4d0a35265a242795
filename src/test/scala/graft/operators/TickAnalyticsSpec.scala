package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{Change, FeedMsg, Level}

/** Trades joined to the prevailing top-of-book. */
class TickAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

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
      side = side, price = price, size = size, asks = asks, bids = bids,
      changes = changes)

  test("each trade sees the book state established before it; " +
    "pre-book trades keep null context") {
    import spark.implicits._
    val feed = Seq(
      // trade before any book event: no prevailing quote
      msg(0, "last_trade_price", side = "BUY", price = "0.50", size = "5"),
      msg(1, "book",
        asks = Seq(Level("0.60", "10")), bids = Seq(Level("0.40", "20"))),
      msg(2, "last_trade_price", side = "SELL", price = "0.55", size = "3"),
      // the book moves; the next trade must see the NEW state
      msg(3, "price_change", changes = Seq(Change("0.60", "0", "SELL"))),
      msg(4, "last_trade_price", side = "BUY", price = "0.45", size = "7"),
    ).toDS()
    val rows = TickAnalytics
      .tradesWithPrevailingBbo(BookReplay.ticks(feed))
      .select("line_no", "price", "prev_ask_price", "prev_bid_price")
      .orderBy("line_no")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toSeq
    assert(rows == Seq(
      (0L, 0.50, None, None), // pre-book trade: null context
      (2L, 0.55, Some(0.60), Some(0.40)), // sees the snapshot
      (4L, 0.45, Some(0.0), Some(0.40)), // sees the emptied ask side
    ))
  }
}
