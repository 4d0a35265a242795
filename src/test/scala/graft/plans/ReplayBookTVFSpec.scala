package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{Change, FeedMsg, Level, Tick}
import graft.operators.BookReplay

/** The SQL surface of the replay: `SELECT * FROM replay_book(...)`
  * must produce the same rows AND the same physical plan shape as the
  * Dataset API.
  */
class ReplayBookTVFSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def msg(
      lineNo: Long,
      eventType: String,
      asset: String = "A1",
      market: String = "0xM1",
      side: String = null,
      price: String = null,
      size: String = null,
      asks: Seq[Level] = null,
      bids: Seq[Level] = null,
      changes: Seq[Change] = null,
  ): FeedMsg =
    FeedMsg("2025-07-01-14", lineNo, 0, eventType, market, asset,
      ts = (1751378400000L + lineNo).toString,
      side = side, price = price, size = size,
      asks = asks, bids = bids, changes = changes)

  private lazy val msgs = Seq(
    msg(0, "book", asset = "A1", market = "0xM1",
      asks = Seq(Level("0.60", "10")), bids = Seq(Level("0.50", "20"))),
    msg(1, "price_change", asset = "A1", market = "0xM1",
      changes = Seq(Change("0.60", "0", "SELL"))),
    msg(2, "book", asset = "A2", market = "0xM2",
      asks = Seq(Level("0.70", "1")), bids = Seq(Level("0.30", "2"))),
    msg(3, "last_trade_price", asset = "A2", market = "0xM2",
      side = "BUY", price = "0.31", size = "5"),
  )

  private def sortKey(t: Tick) =
    (t.asset, t.file_hour, t.line_no, t.msg_idx, t.emit_idx)

  test("replay_book('view') equals BookReplay.ticks row for row") {
    import spark.implicits._
    ReplayBookTVF.register(spark)
    spark.createDataset(msgs).createOrReplaceTempView("tvf_feed")
    try {
      val viaSql = spark.sql("SELECT * FROM replay_book('tvf_feed')")
        .as[Tick].collect().sortBy(sortKey).toSeq
      val viaApi = BookReplay.ticks(spark.createDataset(msgs))
        .collect().sortBy(sortKey).toSeq
      assert(viaSql.nonEmpty && viaSql == viaApi)
    } finally spark.catalog.dropTempView("tvf_feed")
  }

  test("market filter args form the F2 IN-set, pushed below the shuffle " +
    "and into the parquet scan") {
    import spark.implicits._
    ReplayBookTVF.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_tvf_feed").toString
    spark.createDataset(msgs).write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("tvf_feed_pq")
    try {
      val df = spark.sql("SELECT * FROM replay_book('tvf_feed_pq', '0xM2')")
      val got = df.as[Tick].collect().sortBy(sortKey).toSeq
      val expect = BookReplay.ticks(spark.createDataset(msgs), Some(Set("0xM2")))
        .collect().sortBy(sortKey).toSeq
      assert(got == expect && got.forall(_.market == "0xM2"))
      // the filter reaches the scan, UNDER the exchange: the shuffle
      // moves only the requested market's rows
      val p = df.queryExecution.executedPlan.toString
      val exchangeIdx = p.indexOf("Exchange hashpartitioning(assetId")
      val pushedIdx = p.indexOf("0xM2")
      assert(exchangeIdx >= 0 && pushedIdx > exchangeIdx,
        s"market filter not below the exchange:\n$p")
      assert(p.contains("PushedFilters") &&
        p.substring(p.indexOf("PushedFilters")).take(200).contains("market"),
        s"market predicate not pushed into the scan:\n$p")
    } finally spark.catalog.dropTempView("tvf_feed_pq")
  }

  test("bad arguments fail fast with descriptive errors") {
    import spark.implicits._
    ReplayBookTVF.register(spark)
    spark.createDataset(msgs).createOrReplaceTempView("tvf_feed")
    try {
      val e1 = intercept[Exception](spark.sql("SELECT * FROM replay_book()"))
      assert(e1.getMessage.contains("table name"))
      val e2 = intercept[Exception](
        spark.sql("SELECT * FROM replay_book('tvf_feed', 42)"))
      assert(e2.getMessage.contains("string literals"))
    } finally spark.catalog.dropTempView("tvf_feed")
  }
}
