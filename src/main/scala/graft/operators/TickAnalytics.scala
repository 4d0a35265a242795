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

  /** Time-weighted average quoted spread per asset — the liquidity
    * number market-quality studies report (a plain average over book
    * EVENTS over-weights busy moments; weighting each top-of-book
    * STATE by how long it prevailed measures what a taker actually
    * faced). Each BBO row carries the state AFTER it (carry-forward
    * ask/bid in arrival order); its weight is the ms until the next
    * BBO event on that asset. Rows where either side is missing or
    * empty ((0,0) — C11's zero-size marker renders as price 0) are
    * unquoted time and excluded, as is each asset's open-ended final
    * state (half-open observation window). Spread math is integer
    * cents × integer ms — exact — with one terminal division. Same
    * one-exchange shape as [[tradesWithPrevailingBbo]]: two window
    * passes and the final agg all ride the asset partition.
    */
  def timeWeightedSpread(ticks: Dataset[Tick]): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val ord = Window
      .partitionBy($"asset")
      .orderBy($"file_hour", $"line_no", $"msg_idx", $"emit_idx")
    val w = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def lastSide(side: String) =
      last(when($"side" === side, round($"price" * 100).cast("long")),
        ignoreNulls = true).over(w)
    ticks
      .filter($"kind" === "BBO")
      .withColumn("ask_c", lastSide("ASK"))
      .withColumn("bid_c", lastSide("BID"))
      .withColumn("ts_ms", $"timestamp".cast("long"))
      .withColumn("dur", lead($"ts_ms", 1).over(ord) - $"ts_ms")
      .filter($"dur".isNotNull && $"ask_c".isNotNull && $"bid_c".isNotNull &&
        $"ask_c" > 0 && $"bid_c" > 0)
      .groupBy($"asset")
      .agg(
        count(lit(1)).as("n_states"),
        sum($"dur").as("ms_quoted"),
        round(sum(($"ask_c" - $"bid_c") * $"dur") / sum($"dur") / 100.0, 4)
          .as("twa_spread"))
  }
}
