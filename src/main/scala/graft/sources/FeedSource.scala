package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S5 — the live feed as a REAL custom Structured Streaming source
  * (DataSourceV2), the Spark analog of the reference's WebSocket
  * client (`Connection::subscribe` / read loop,
  * `collector/src/client/connection.rs:231-360`).
  *
  * In this zero-egress environment the socket is replaced by a
  * deterministic frame generator speaking the exact reference wire
  * format (`collector/src/main.rs:18-69`): each emitted row is one
  * raw frame line (`value STRING`), so the downstream pipeline is
  * IDENTICAL to the recorded-log path —
  * `RawLogSource.feedMessagesFromLines` → `StreamingReplay.ticksStream`
  * — which is the point: a real socket source only has to swap the
  * generator for a network read loop; offsets, admission control,
  * restart and the whole query surface stay as built here.
  *
  * Source contract implemented:
  *   - `MicroBatchStream` with monotonic long offsets (frame index);
  *     `planInputPartitions(start, end)` slices the range across
  *     `numPartitions` readers, so a batch parallelizes like any scan.
  *   - Admission control (`SupportsAdmissionControl.latestOffset`)
  *     caps each micro-batch at `framesPerBatch` — the analog of the
  *     reference's bounded mpsc(1000) event channel
  *     (`collector/src/client/mod.rs:86`).
  *   - `SupportsTriggerAvailableNow`: `Trigger.AvailableNow` drains
  *     exactly the frames that existed at query start, in
  *     `framesPerBatch` chunks, then stops — deterministic and
  *     restart-safe (offsets are pure frame indexes; the generator is
  *     a pure function of the index, so recovery replays identical
  *     data, the property checkpointed sources must guarantee).
  *   - `BATCH_READ`: the same table is readable with `spark.read`,
  *     which is what lets tests assert stream ≡ batch.
  *
  * Options: `totalFrames` (default 500), `framesPerBatch` (default
  * 100), `nMarkets` (2), `assetsPerMarket` (2), `numPartitions` (4).
  * Register by class (`format("graft.sources.GraftFeedProvider")`) or
  * short name `graft-feed` (DataSourceRegister service file).
  */
class GraftFeedProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-feed"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftFeed.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // fixed-schema source: a caller's .schema(...) must match, like
    // other fixed-schema V2 sources — silently serving the built-in
    // shape under a different user schema would corrupt downstream
    require(schema == GraftFeed.schema,
      s"graft-feed has a fixed schema ${GraftFeed.schema.simpleString}; got ${schema.simpleString}")
    val opts = new CaseInsensitiveStringMap(properties)
    if (opts.containsKey("host")) new GraftLiveFeedTable(opts)
    else new GraftFeedTable(opts)
  }
}

object GraftFeed {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))

  final case class Opts(
      totalFrames: Long,
      framesPerBatch: Long,
      nMarkets: Int,
      assetsPerMarket: Int,
      numPartitions: Int,
  )

  def opts(m: CaseInsensitiveStringMap): Opts = Opts(
    totalFrames = m.getLong("totalFrames", 500L),
    framesPerBatch = m.getLong("framesPerBatch", 100L),
    nMarkets = m.getInt("nMarkets", 2),
    assetsPerMarket = m.getInt("assetsPerMarket", 2),
    numPartitions = m.getInt("numPartitions", 4),
  )

  private val EpochMs = 1751378400000L // 2025-07-01T14:00:00Z

  /** RFC3339 receipt timestamp, strictly increasing with the frame
    * index (one second per frame) — the arrival key the streaming
    * parse sorts on. Computed from the epoch so day/hour boundaries
    * roll correctly at any totalFrames (a hand-rolled "hour = 14 +
    * i/3600" would emit invalid hour-24 stamps past 36k frames).
    */
  private def receiptTs(i: Long): String =
    java.time.Instant.ofEpochMilli(EpochMs + i * 1000L).toString

  private def cents(c: Long): String = f"0.${math.max(1, math.min(99, c))}%02d"

  /** Structured form of frame `i`'s feed message, a pure function of
    * the index — `None` for the dimension frame (i = 0), PONGs and
    * unknown-event frames, which carry nothing the book fold consumes.
    * This is the generator's ground truth: `frameLine` renders the wire
    * bytes FROM it (via [[WireJson]]), and the replay oracle dump reads
    * it directly, so wire and oracle cannot drift. `line_no` carries
    * the frame index (the arrival key; `file_hour` is constant — all
    * that matters to the fold is the total order).
    */
  def structuredMsg(i: Long, nMarkets: Int, assetsPerMarket: Int): Option[WireMsg] = {
    if (i == 0) return None
    val nAssets = nMarkets * assetsPerMarket
    val asset = s"A${i % nAssets}"
    val market = s"0xM${(i % nAssets) / assetsPerMarket}"
    val exchMs = (EpochMs + i * 1000).toString
    val msg = i % 10 match {
      case 1 | 2 => None // PONG (F5) / unknown event (F6)
      case 3 | 7 => // full snapshot: 2 asks + 2 bids
        val a0 = 50 + i % 20
        Some(WireMsg.book(market, asset, exchMs,
          asks = Seq(
            graft.model.Level(cents(a0), (10 + i % 90).toString),
            graft.model.Level(cents(a0 + 2), (5 + i % 50).toString)),
          bids = Seq(
            graft.model.Level(cents(a0 - 5), (8 + i % 70).toString),
            graft.model.Level(cents(a0 - 8), (3 + i % 40).toString))))
      case 5 => // trade
        Some(WireMsg.trade(market, asset, exchMs,
          side = if (i % 4 == 1) "BUY" else "SELL",
          price = cents(30 + i % 40),
          size = (1 + i % 500).toString))
      case _ => // diff; every 4th change is a level delete
        Some(WireMsg.diff(market, asset, exchMs, Seq(graft.model.Change(
          price = cents(20 + (i * 7) % 60),
          size = if (i % 4 == 0) "0" else (1 + i % 300).toString,
          side = if (i % 2 == 0) "BUY" else "SELL"))))
    }
    msg.map(_.copy(file_hour = "", line_no = i))
  }

  /** One wire frame line, a PURE function of the frame index — random
    * access for any partition slice, and identical bytes on recovery
    * replay. Frame mix mirrors FixtureLog: dimension frame first, then
    * PONGs (F5), unknown events (F6), snapshots, trades, diffs with
    * level deletes. Feed events render from [[structuredMsg]].
    */
  def frameLine(i: Long, nMarkets: Int, assetsPerMarket: Int): String = {
    val ts = receiptTs(i)
    if (i == 0) {
      // active_markets dimension frame, as at startup
      // (`collector/src/main.rs:212-229,346-347`)
      val markets = (0 until nMarkets).map { m =>
        val tokens = (0 until assetsPerMarket).map { a =>
          s"""{"outcome":"${if (a == 0) "Yes" else "No"}","price":0.5,"token_id":"A${m * assetsPerMarket + a}","winner":false}"""
        }.mkString(",")
        s"""{"closed":false,"accepting_orders":true,"active":true,"archived":false,"enable_order_book":true,"id":"$m","condition_id":"0xM$m","question_id":"0xQ$m","question":"Live feed market $m?","description":"live","tokens":[$tokens]}"""
      }.mkString(",")
      return s"""{"timestamp":"$ts","message_type":"active_markets","content":{"count":$nMarkets,"markets":[$markets]}}"""
    }
    val nAssets = nMarkets * assetsPerMarket
    val asset = i % nAssets
    val market = asset / assetsPerMarket
    val exchMs = EpochMs + i * 1000
    i % 10 match {
      case 1 => // server keepalive — dropped at parse (F5)
        s"""{"timestamp":"$ts","message_type":"feed_message","content":"PONG"}"""
      case 2 => // unknown event type — dropped (F6)
        WireJson.feedFrame(ts,
          s"""{"event_type":"tick_size_change","asset_id":"A$asset","market":"0xM$market","timestamp":"$exchMs","old_tick_size":"0.01","new_tick_size":"0.001"}""")
      case _ =>
        WireJson.frame(ts, structuredMsg(i, nMarkets, assetsPerMarket).get)
    }
  }
}

/** Long offset (frame index) with trivial JSON round-trip. */
final case class FeedOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class GraftFeedTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val o = GraftFeed.opts(options)
  override def name(): String = s"graft_feed(${o.totalFrames})"
  override def schema(): StructType = GraftFeed.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveStringMap: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftFeedScan(o)
    }
}

class GraftFeedScan(o: GraftFeed.Opts) extends Scan {
  override def readSchema(): StructType = GraftFeed.schema
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      GraftFeedStream.slices(0L, o.totalFrames, o.numPartitions)
    override def createReaderFactory(): PartitionReaderFactory =
      new FeedReaderFactory(o.nMarkets, o.assetsPerMarket)
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftFeedStream(o)
}

object GraftFeedStream {
  /** Slice [start, end) into ≤ n contiguous ranges (n clamped ≥ 1). */
  def slices(start: Long, end: Long, n: Int): Array[InputPartition] = {
    val nn = math.max(1, n)
    val total = math.max(0L, end - start)
    val per = math.max(1L, (total + nn - 1) / nn)
    Iterator
      .iterate(start)(_ + per)
      .takeWhile(_ < end)
      .map(b => FeedRange(b, math.min(b + per, end)): InputPartition)
      .toArray
  }
}

final case class FeedRange(begin: Long, end: Long) extends InputPartition

class GraftFeedStream(o: GraftFeed.Opts)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // frames "arrived" so far: grows by framesPerBatch per poll until
  // totalFrames, like a drained bounded channel; AvailableNow pins the
  // drain target to what existed at query start
  @volatile private var availableNowCap: Long = -1L

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = o.totalFrames

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(o.framesPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val begin = start.asInstanceOf[FeedOffset].n
    val cap = if (availableNowCap >= 0) availableNowCap else o.totalFrames
    val step = limit match {
      case rl: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => rl.maxRows()
      case _ => o.framesPerBatch
    }
    // never regress below the committed offset: a restart with a
    // SMALLER totalFrames than the checkpoint has already consumed
    // must idle (empty batches), not hand the engine end < start
    FeedOffset(math.max(begin, math.min(begin + step, cap)))
  }

  override def reportLatestOffset(): Offset = FeedOffset(o.totalFrames)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) drives this admission-controlled source")

  override def initialOffset(): Offset = FeedOffset(0L)

  override def deserializeOffset(json: String): Offset = FeedOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    GraftFeedStream.slices(
      start.asInstanceOf[FeedOffset].n,
      end.asInstanceOf[FeedOffset].n,
      o.numPartitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new FeedReaderFactory(o.nMarkets, o.assetsPerMarket)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class FeedReaderFactory(nMarkets: Int, assetsPerMarket: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[FeedRange]
    new PartitionReader[InternalRow] {
      private var i = r.begin - 1
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(
          GraftFeed.frameLine(i, nMarkets, assetsPerMarket)))
      override def close(): Unit = ()
    }
  }
}

// ---------------------------------------------------------------------------
// Live mode: the same table surface fed by the REAL socket transport
// ---------------------------------------------------------------------------

/** JVM-global frame buffers for live streams: the driver-side
  * [[LiveFeedClient]] appends arriving frames under a unique key, and
  * partition readers slice by index. LOCAL-MODE contract (documented,
  * deliberate): readers resolve the key in the same JVM, which holds
  * on `local[n]` — the target of the loopback integration. A cluster
  * deployment does NOT stream executors off a driver socket; it runs
  * the collector shape the reference runs — the live client lands raw
  * frames in durable storage (K2's rotating zstd-JSONL sink) and
  * executors read THAT, giving replayable offsets. Live mode exists to
  * drive the transport + query surface end-to-end, not to pretend a
  * single socket feeds a thousand executors.
  */
object LiveFeedRegistry {
  private val buffers =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.ArrayList[String]]()

  def create(key: String): Unit =
    buffers.putIfAbsent(key, new java.util.ArrayList[String]())

  /** No-op on a missing key: `stop()` removes the entry while the
    * drainer thread may still be polling the client queue, and a late
    * frame must not kill the daemon with an NPE.
    */
  def append(key: String, line: String): Unit = {
    val b = buffers.get(key)
    if (b != null) b.synchronized { b.add(line); () }
  }

  def size(key: String): Int = {
    val b = buffers.get(key)
    if (b == null) 0 else b.synchronized(b.size())
  }

  def slice(key: String, begin: Long, end: Long): Array[String] = {
    val b = buffers.get(key)
    require(b != null,
      s"live feed buffer '$key' not found — live mode requires readers in " +
        "the driver JVM (local mode); on a cluster land frames durably first")
    b.synchronized {
      require(begin >= 0 && end <= b.size(),
        s"live feed buffer '$key' has ${b.size()} frames but [$begin, $end) " +
          "was requested — live-mode offsets index a per-run in-memory " +
          "buffer and are NOT restart-recoverable; restart the query with " +
          "a fresh checkpoint (on a cluster land frames durably first)")
      (begin until end).map(i => b.get(i.toInt)).toArray
    }
  }

  def remove(key: String): Unit = { buffers.remove(key); () }
}

class GraftLiveFeedTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft_feed_live(${options.get("host")}:${options.get("port")})"
  override def schema(): StructType = GraftFeed.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(m: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = GraftFeed.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftLiveFeedStream(options)
      }
    }
}

/** MicroBatchStream over the live client: offsets are arrived-frame
  * indexes into the registry buffer; each trigger admits everything
  * arrived so far. Options: `host`, `port`, `assets`
  * (comma-separated token ids), `numPartitions`,
  * plus the [[LiveFeed.Config]] timing knobs (`pingIntervalMs`,
  * `splitThreshold`, …) for tests.
  */
class GraftLiveFeedStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream {

  private val key = s"live-${java.util.UUID.randomUUID()}"
  private val numPartitions = options.getInt("numPartitions", 4)

  private lazy val client: LiveFeedClient = {
    val assets = Option(options.get("assets"))
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)
    val cfg = LiveFeed.Config(
      host = options.get("host"),
      port = options.getInt("port", 0),
      maxAssetsPerConnection = options.getInt("maxAssetsPerConnection", 25),
      splitThreshold = options.getInt("splitThreshold", 20),
      initialReadTimeoutMs = options.getInt("initialReadTimeoutMs", 10000),
      pingIntervalMs = options.getLong("pingIntervalMs", 15000L),
      longLivedMs = options.getLong("longLivedMs", 30000L),
      idlePaceMs = options.getLong("idlePaceMs", 500L),
      errorBackoffUnitMs = options.getLong("errorBackoffUnitMs", 1000L),
      wsFraming = Option(options.get("framing")).contains("ws"),
      // wss://: a truststore path pins the server cert; the TLS layer
      // wraps the socket beneath whichever framing is selected
      sslContext = Option(options.get("tlsTruststore")).map(p =>
        TlsLoopback.clientContext(p,
          Option(options.get("tlsStorePass")).getOrElse("loopback"))),
    )
    LiveFeedRegistry.create(key)
    val c = new LiveFeedClient(assets, cfg)
    c.start()
    val drainer = new Thread(() => {
      var live = true
      while (live) {
        val ev = c.events.poll(100, java.util.concurrent.TimeUnit.MILLISECONDS)
        ev match {
          case LiveFeed.FeedMessage(text) => LiveFeedRegistry.append(key, text)
          case LiveFeed.ConnectionClosed(_, 0, _) if stopped => live = false
          case _ => if (stopped && ev == null) live = false
        }
      }
    }, s"graft-live-feed-drainer-$key")
    drainer.setDaemon(true)
    drainer.start()
    c
  }
  @volatile private var stopped = false

  override def initialOffset(): Offset = FeedOffset(0L)

  override def latestOffset(): Offset = {
    val c = client // starts lazily on the first poll
    require(c != null, "unreachable")
    val arrived = LiveFeedRegistry.size(key).toLong
    FeedOffset(arrived)
  }

  override def deserializeOffset(json: String): Offset = FeedOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    GraftFeedStream.slices(
      start.asInstanceOf[FeedOffset].n,
      end.asInstanceOf[FeedOffset].n,
      numPartitions)

  override def createReaderFactory(): PartitionReaderFactory = {
    val k = key
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val r = partition.asInstanceOf[FeedRange]
        val lines = LiveFeedRegistry.slice(k, r.begin, r.end)
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < lines.length }
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(lines(i)))
          override def close(): Unit = ()
        }
      }
    }
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = {
    stopped = true
    client.stop()
    LiveFeedRegistry.remove(key)
  }
}
