package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Tick

/** `TickAnalytics.tradesWithPrevailingBbo` — the prevailing-quote
  * window behind q_tick_trades_bbo.
  */
class TickAnalyticsSpec2 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tick(kind: String, asset: String, side: String, price: Double,
      size: Double, lineNo: Long, emitIdx: Int = 0): Tick =
    Tick(timestamp = (1700000000000L + lineNo).toString, kind = kind,
      market = "0xM0", asset = asset, side = side, price = price, size = size,
      file_hour = "h0", line_no = lineNo, msg_idx = 0, emit_idx = emitIdx)

  test("each trade sees the latest at-or-before quote per side and asset") {
    import spark.implicits._
    val ticks = Seq(
      tick("BBO", "A", "ASK", 0.60, 10, 1, 0),
      tick("BBO", "A", "BID", 0.55, 12, 1, 1),
      tick("TRADE", "A", "BID", 0.56, 3, 2),    // sees 0.60/0.55
      tick("BBO", "A", "ASK", 0.58, 7, 3, 0),
      tick("BBO", "A", "BID", 0.54, 9, 3, 1),
      tick("TRADE", "A", "ASK", 0.57, 4, 4),    // sees 0.58/0.54
      tick("TRADE", "B", "BID", 0.30, 1, 5),    // asset B: no quotes yet
    ).toDS()
    val out = TickAnalytics.tradesWithPrevailingBbo(ticks)
      .orderBy($"line_no").collect()
    assert(out.length == 3)
    val t1 = out(0)
    assert(t1.getAs[Double]("prev_ask_price") == 0.60 &&
      t1.getAs[Double]("prev_bid_price") == 0.55 &&
      t1.getAs[Double]("prev_bid_size") == 12)
    val t2 = out(1)
    assert(t2.getAs[Double]("prev_ask_price") == 0.58 &&
      t2.getAs[Double]("prev_bid_price") == 0.54)
    // trade with no prior book state keeps null context (left semantics)
    val t3 = out(2)
    assert(t3.isNullAt(t3.fieldIndex("prev_ask_price")) &&
      t3.isNullAt(t3.fieldIndex("prev_bid_price")))
  }
}
