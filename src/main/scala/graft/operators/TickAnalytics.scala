package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tick

/** Analytics over the tick table — the reference's downstream query
  * surface (`notebooks/bbo.ipynb` overlays trades on BBO state).
  */
object TickAnalytics {

  /** Every TRADE with the PREVAILING top-of-book: the latest BBO ask
    * and bid at-or-before the trade in arrival order, per asset — the
    * as-of join specialized to the tick stream (the notebook does the
    * 1-minute-grid approximation of exactly this).
    *
    * One shuffle on asset: a single window pass carries the last seen
    * ask/bid forward (BBO rows of a book event always precede a later
    * trade in the total arrival order, so `last(...) ignoreNulls` over
    * rows up to the current one is the prevailing quote). Trades
    * before any book event keep null context (`how = "left"`
    * semantics; filter `prev_ask_price IS NOT NULL` for inner).
    */
  def tradesWithPrevailingBbo(ticks: Dataset[Tick]): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val w = Window
      .partitionBy($"asset")
      .orderBy($"file_hour", $"line_no", $"msg_idx", $"emit_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def prevailing(side: String, field: String) =
      last(
        when($"kind" === "BBO" && $"side" === side, col(field)),
        ignoreNulls = true).over(w)
    ticks
      .withColumn("prev_ask_price", prevailing("ASK", "price"))
      .withColumn("prev_ask_size", prevailing("ASK", "size"))
      .withColumn("prev_bid_price", prevailing("BID", "price"))
      .withColumn("prev_bid_size", prevailing("BID", "size"))
      .filter($"kind" === "TRADE")
      .select(
        $"timestamp", $"market", $"asset", $"side", $"price", $"size",
        $"prev_ask_price", $"prev_ask_size",
        $"prev_bid_price", $"prev_bid_size",
        $"file_hour", $"line_no", $"msg_idx",
      )
  }
}
