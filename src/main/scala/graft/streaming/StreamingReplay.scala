package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.model.{FeedMsg, Level, Tick}
import graft.operators.Book

/** Structured Streaming variant of the book replay (SURVEY.md §2.7):
  * the same fold as BookReplay, with the book held in per-key
  * `GroupState` instead of a partition-local variable — state lives
  * across micro-batches exactly like the reference's long-running
  * collector state lives across messages.
  *
  * Ordering: within one micro-batch a key's messages are sorted by the
  * arrival key before folding. Across micro-batches, ordering is the
  * source's append order (hourly files in hour order / a log-ordered
  * queue), which matches the reference's replay contract. Books need
  * no watermark: periodic `book` snapshots self-heal any divergence
  * (`tick_generator.rs:241-254`); windowed analytics set watermarks on
  * the exchange timestamp instead.
  *
  * Scale: state per key is one book (a few hundred levels); the
  * streaming shuffle is the same HashPartitioning(assetId) as batch.
  * For dead assets, pass a `stateTtl` so books of delisted markets
  * are dropped (documented deviation from the reference, which keeps
  * them forever in a 2 GB-capped process). Note that with a TTL the
  * engine schedules batches every trigger interval even with no data
  * (that is how pending timeouts fire), so pair `stateTtl` with an
  * explicit `Trigger.ProcessingTime(...)` — under the default 0 ms
  * trigger the query busy-spins and `processAllAvailable` never
  * returns. Eviction under RocksDB is spec'd in LiveIngestSpec.
  */
object StreamingReplay {

  /** Serializable book state: level lists (price/size decimal strings,
    * exact round trip into the TreeMap representation).
    */
  final case class BookState(asks: Seq[Level], bids: Seq[Level])

  private[streaming] def toBook(st: BookState): Book =
    new Book().resetFromSnapshot(st.asks, st.bids)

  private[streaming] def fromBook(b: Book): BookState = BookState(
    asks = b.asks.iterator.map { case (p, s) => Level(p.toPlainString, s.toPlainString) }.toSeq,
    bids = b.bids.iterator.map { case (p, s) => Level(p.toPlainString, s.toPlainString) }.toSeq,
  )

  def ticksStream(
      msgs: Dataset[FeedMsg],
      marketFilter: Option[Set[String]] = None,
      stateTtl: Option[String] = None,
  ): Dataset[Tick] = {
    val spark = msgs.sparkSession
    import spark.implicits._
    val filtered = marketFilter match {
      case Some(ids) => msgs.filter(m => ids.contains(m.market))
      case None => msgs
    }
    val timeout = stateTtl
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())

    filtered
      .groupByKey(_.assetId)
      .flatMapGroupsWithState[BookState, Tick](OutputMode.Append(), timeout) {
        (_: String, it: Iterator[FeedMsg], state: GroupState[BookState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val book = state.getOption.map(toBook).getOrElse(new Book)
            val ordered = it.toSeq.sortBy(m => (m.fileHour, m.lineNo, m.msgIdx))
            val out = ordered.iterator.flatMap(m => applyMsg(book, m)).toVector
            state.update(fromBook(book))
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** The same fold on the MODERN state API (`transformWithState`,
    * Spark 4): the book lives in a `ValueState[BookState]` with NATIVE
    * per-value TTL (`TTLConfig`) instead of manual
    * `GroupStateTimeout` bookkeeping — an expired book simply reads as
    * absent, so dead-asset eviction needs no timer branch at all. The
    * engine requires the RocksDB state store provider for this
    * operator, which is the production provider anyway. Kept alongside
    * `ticksStream` (not replacing it): parity between the two is
    * spec'd, and the older API remains for HDFS-backed state stores.
    */
  def ticksStreamTWS(
      msgs: Dataset[FeedMsg],
      marketFilter: Option[Set[String]] = None,
      stateTtl: Option[java.time.Duration] = None,
  ): Dataset[Tick] = {
    val spark = msgs.sparkSession
    import spark.implicits._
    val filtered = marketFilter match {
      case Some(ids) => msgs.filter(m => ids.contains(m.market))
      case None => msgs
    }
    // TTL cleanup is wall-clock based => ProcessingTime time mode
    val timeMode =
      if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    filtered
      .groupByKey(_.assetId)
      .transformWithState(new BookProcessor(stateTtl), timeMode, OutputMode.Append())
  }

  /** StatefulProcessor form of the book fold (see `ticksStreamTWS`). */
  private[streaming] class BookProcessor(stateTtl: Option[java.time.Duration])
      extends StatefulProcessor[String, FeedMsg, Tick] {
    @transient private var bookState: ValueState[BookState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl = stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
      bookState = getHandle.getValueState[BookState](
        "book", Encoders.product[BookState], ttl)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[FeedMsg],
        timerValues: TimerValues): Iterator[Tick] = {
      // an expired (TTL) or absent value both read as non-existent:
      // the fold starts a fresh book either way
      val book =
        if (bookState.exists()) toBook(bookState.get()) else new Book
      val ordered = rows.toSeq.sortBy(m => (m.fileHour, m.lineNo, m.msgIdx))
      val out = ordered.iterator.flatMap(m => applyMsg(book, m)).toVector
      bookState.update(fromBook(book))
      out.iterator
    }
  }

  /** One message against the live book — same emission contract as the
    * batch fold (`MarketState::update`, `tick_generator.rs:318-362`).
    */
  private def applyMsg(book: Book, m: FeedMsg): Seq[Tick] = m.eventType match {
    case "last_trade_price" if m.price != null && m.size != null =>
      val side = if (m.side == "BUY") "BID" else "ASK"
      Seq(Tick(m.ts, "TRADE", m.market, m.assetId, side,
        new java.math.BigDecimal(m.price).doubleValue,
        new java.math.BigDecimal(m.size).doubleValue,
        m.fileHour, m.lineNo, m.msgIdx, 0))
    case "book" =>
      book.resetFromSnapshot(m.asks, m.bids)
      bbo(book, m)
    case "price_change" =>
      book.updateFromDiff(m.changes)
      bbo(book, m)
    case _ => Nil
  }

  private def bbo(book: Book, m: FeedMsg): Seq[Tick] = {
    val (ap, as) = book.topAsk
    val (bp, bs) = book.topBid
    Seq(
      Tick(m.ts, "BBO", m.market, m.assetId, "ASK", ap, as, m.fileHour, m.lineNo, m.msgIdx, 0),
      Tick(m.ts, "BBO", m.market, m.assetId, "BID", bp, bs, m.fileHour, m.lineNo, m.msgIdx, 1),
    )
  }

  /** A1 streaming: last BBO price per (1-minute tumbling window, side)
    * with a watermark on the exchange timestamp — late data beyond the
    * delay is dropped, windows finalize incrementally
    * (`notebooks/bbo.ipynb` cell 2's `resample('1min').last()`).
    * `max_by` over the total arrival key makes "last" deterministic.
    */
  def bboMinutely(ticks: Dataset[Tick], watermark: String = "2 minutes"): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .filter($"kind" === "BBO")
      // try_cast + drop, not cast: the reference carries the exchange
      // timestamp as a raw string end-to-end (tick_generator.rs:51),
      // so a non-numeric one can reach a long-running stream — under
      // ANSI a plain cast would throw and kill the query at hour
      // 90,000 instead of classifying the tick as dirty
      .withColumn("event_ts", timestamp_millis(expr("try_cast(timestamp AS LONG)")))
      .filter($"event_ts".isNotNull)
      .withWatermark("event_ts", watermark)
      .groupBy(window($"event_ts", "1 minute"), $"asset", $"side")
      .agg(
        max_by($"price", struct($"file_hour", $"line_no", $"msg_idx")).as("last_price"),
        count(lit(1)).as("n_events"),
      )
      .select($"window.start".as("minute"), $"asset", $"side", $"last_price", $"n_events")
  }

  /** A2 streaming: hourly traded volume per asset (watermarked sum). */
  def hourlyVolume(ticks: Dataset[Tick], watermark: String = "2 minutes"): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .filter($"kind" === "TRADE")
      // same dirty-timestamp policy as bboMinutely
      .withColumn("event_ts", timestamp_millis(expr("try_cast(timestamp AS LONG)")))
      .filter($"event_ts".isNotNull)
      .withWatermark("event_ts", watermark)
      .groupBy(window($"event_ts", "1 hour"), $"asset")
      .agg(sum($"size").as("volume"), count(lit(1)).as("n_trades"))
      .select($"window.start".as("hour"), $"asset", $"volume", $"n_trades")
  }

  /** A5: per-batch observable metrics (messages + bytes-ish volume),
    * readable from a StreamingQueryListener's `observedMetrics` — the
    * streaming analog of the reference's 15 s msgs/sec log
    * (`collector/src/main.rs:275-290`).
    */
  def withIngestMetrics(msgs: Dataset[FeedMsg]): Dataset[FeedMsg] =
    msgs.observe("ingest",
      count(lit(1)).as("n_messages"),
      sum(length(col("ts")) + length(col("market")) + length(col("assetId")))
        .as("approx_bytes"))

  /** Periodic dimension refresh (SURVEY.md §2.7 "market discovery"):
    * the reference re-fetches the markets dimension by RESTARTING the
    * collector every 6 hours (`deploy/src/main.rs:111-112`); the
    * streaming analog restarts nothing — `foreachBatch` re-resolves
    * the dimension source at EVERY micro-batch, so a refreshed dim
    * (new tokens, flipped winners, delisted markets) joins against the
    * next batch without touching the query or its state.
    *
    * `readDim` must re-READ the source (e.g. a fresh
    * `spark.read.parquet(dimPath)`) rather than capture a DataFrame:
    * a captured plan pins the file listing from the time it was built,
    * which is exactly the staleness this operator exists to avoid.
    * The dim is broadcast per batch (J1 is a classic small-dim join).
    */
  def sinkWithRefreshedDim(
      ticks: Dataset[Tick],
      readDim: SparkSession => DataFrame,
      write: (DataFrame, Long) => Unit,
  ): DataStreamWriter[Tick] =
    ticks.writeStream.foreachBatch { (batch: Dataset[Tick], batchId: Long) =>
      val dim = readDim(batch.sparkSession)
      val joined = batch.toDF()
        .join(broadcast(dim), batch("asset") === dim("token_id"), "left")
        .drop("token_id")
      write(joined, batchId)
    }
}
