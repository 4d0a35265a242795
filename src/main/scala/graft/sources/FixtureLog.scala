package graft.sources

import java.io.{File, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import scala.util.Random

import com.github.luben.zstd.ZstdOutputStream

/** Deterministic generator of reference-format raw logs
  * (FIXTURES.md §1-2): hourly `YYYY-MM-DD-HH.jsonl.zst` files of JSON
  * frames, including every frame/message variant the replayer must
  * handle — snapshots, diffs (with delete-on-zero), trades, PONGs,
  * unknown event types, operational frames, and an `active_markets`
  * dimension frame with unmodeled extra keys.
  *
  * Seeded `Random` makes output a pure function of the parameters, so
  * pipeline queries built on these fixtures are driver-reproducible.
  */
object FixtureLog {

  final case class Spec(
      dir: String,
      nFiles: Int = 3,
      framesPerFile: Int = 120,
      nMarkets: Int = 2,
      assetsPerMarket: Int = 2,
      seed: Long = 42L,
      compress: Boolean = true, // false → plain .jsonl (streaming text source)
  )

  def assets(spec: Spec): Seq[(String, String)] = // (market, asset)
    for {
      m <- 0 until spec.nMarkets
      a <- 0 until spec.assetsPerMarket
    } yield (s"0xM$m", s"A${m * spec.assetsPerMarket + a}")

  /** Write the fixture files (idempotent — same spec, same bytes) and
    * return their paths in hour order.
    */
  def write(spec: Spec): Seq[String] = {
    val dir = new File(spec.dir)
    dir.mkdirs()
    val written = writeFiles(spec, dir)
    // the fixture dir persists across JVM runs (tmpdir): drop stray
    // files from older specs so directory-globbing readers (the
    // streaming gate) see exactly this spec's files
    val keep = written.map(p => new File(p).getName).toSet
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filterNot(f => keep(f.getName))
      .foreach(f => f.delete(): Unit)
    written
  }

  private def writeFiles(spec: Spec, dir: File): Seq[String] = {
    (0 until spec.nFiles).map { fi =>
      val hour = f"2025-07-01-${10 + fi}%02d"
      val path =
        new File(dir, s"$hour.jsonl" + (if (spec.compress) ".zst" else ""))
      val rnd = new Random(spec.seed + fi)
      val raw = new FileOutputStream(path)
      val out = new OutputStreamWriter(
        if (spec.compress) new ZstdOutputStream(raw) else raw,
        StandardCharsets.UTF_8)
      try writeFile(out, spec, hour, fi, rnd)
      finally out.close()
      path.getPath
    }
  }

  private def writeFile(
      out: OutputStreamWriter,
      spec: Spec,
      hour: String,
      fileIdx: Int,
      rnd: Random,
  ): Unit = {
    val pairs = assets(spec)
    // receipt timestamps strictly increase with the line index (minute
    // then second), like a real single-writer collector log — the
    // streaming path keys arrival order on receipt time
    def frameTs(i: Int) =
      s"2025-07-01T${hour.takeRight(2)}:${f"${(i / 60) % 60}%02d"}:${f"${i % 60}%02d"}+00:00"
    def msgTs(i: Int) = (1751378400000L + fileIdx * 3600000L + i * 1000L).toString

    // dimension frame first, as after each rotation
    // (`collector/src/main.rs:178-179`)
    out.write(activeMarketsFrame(spec, frameTs(0)) + "\n")
    out.write(
      s"""{"timestamp":"${frameTs(0)}","message_type":"all_connections_ready","content":{"connection_count":2,"markets_count":${spec.nMarkets}}}""" + "\n")

    for (i <- 1 to spec.framesPerFile) {
      val (market, asset) = pairs(rnd.nextInt(pairs.size))
      val ts = msgTs(i)
      val line = rnd.nextInt(10) match {
        case 0 => // server keepalive — must be skipped (F5)
          s"""{"timestamp":"${frameTs(i)}","message_type":"feed_message","content":"PONG"}"""
        case 1 => // unknown event type — must be dropped (F6)
          feedFrame(frameTs(i),
            s"""{\\"event_type\\":\\"tick_size_change\\",\\"asset_id\\":\\"$asset\\",\\"market\\":\\"$market\\",\\"timestamp\\":\\"$ts\\",\\"old_tick_size\\":\\"0.01\\",\\"new_tick_size\\":\\"0.001\\"}""")
        case 2 | 3 => // full snapshot
          val asks = levels(rnd, 2 + rnd.nextInt(3), 50 + rnd.nextInt(30), +1)
          val bids = levels(rnd, 2 + rnd.nextInt(3), 45 - rnd.nextInt(30), -1)
          feedFrame(frameTs(i),
            s"""{\\"event_type\\":\\"book\\",\\"asset_id\\":\\"$asset\\",\\"market\\":\\"$market\\",\\"timestamp\\":\\"$ts\\",\\"asks\\":[$asks],\\"bids\\":[$bids]}""")
        case 4 => // trade
          val px = cents(30 + rnd.nextInt(40))
          val sz = (1 + rnd.nextInt(500)).toString
          val side = if (rnd.nextBoolean()) "BUY" else "SELL"
          feedFrame(frameTs(i),
            s"""{\\"event_type\\":\\"last_trade_price\\",\\"asset_id\\":\\"$asset\\",\\"market\\":\\"$market\\",\\"timestamp\\":\\"$ts\\",\\"side\\":\\"$side\\",\\"price\\":\\"$px\\",\\"size\\":\\"$sz\\"}""")
        case _ => // diff, ~1/4 of whose changes are level deletes
          val n = 1 + rnd.nextInt(3)
          val chs = (0 until n)
            .map { _ =>
              val px = cents(20 + rnd.nextInt(60))
              val sz = if (rnd.nextInt(4) == 0) "0" else (1 + rnd.nextInt(300)).toString
              val side = if (rnd.nextBoolean()) "BUY" else "SELL"
              s"""{\\"price\\":\\"$px\\",\\"size\\":\\"$sz\\",\\"side\\":\\"$side\\"}"""
            }
            .mkString(",")
          feedFrame(frameTs(i),
            s"""{\\"event_type\\":\\"price_change\\",\\"asset_id\\":\\"$asset\\",\\"market\\":\\"$market\\",\\"timestamp\\":\\"$ts\\",\\"changes\\":[$chs]}""")
      }
      out.write(line + "\n")
    }
    out.write(
      s"""{"timestamp":"${frameTs(spec.framesPerFile + 1)}","message_type":"shutdown_initiated","content":{"signal":"SIGTERM"}}""" + "\n")
  }

  private def cents(c: Int): String = f"0.${c}%02d"

  private def levels(rnd: Random, n: Int, base: Int, dir: Int): String =
    (0 until n)
      .map { k =>
        val px = cents(math.max(1, math.min(99, base + dir * k)))
        val sz = (1 + rnd.nextInt(400)).toString
        s"""{\\"price\\":\\"$px\\",\\"size\\":\\"$sz\\"}"""
      }
      .mkString(",")

  /** Two-token markets with an unmodeled `neg_risk` key, exercising the
    * open-schema path (`collector/src/lib.rs:40-41,63-65`). One market
    * is intentionally inactive (closed) to exercise F1.
    */
  private def activeMarketsFrame(spec: Spec, ts: String): String = {
    val markets = (0 until spec.nMarkets)
      .map { m =>
        val closed = m == spec.nMarkets - 1 && spec.nMarkets > 1
        val tokens = (0 until spec.assetsPerMarket)
          .map { a =>
            val asset = s"A${m * spec.assetsPerMarket + a}"
            val outcome = if (a == 0) "Yes" else "No"
            s"""{"outcome":"$outcome","price":0.5,"token_id":"$asset","winner":false,"extra_tag":"t$a"}"""
          }
          .mkString(",")
        s"""{"closed":$closed,"accepting_orders":${!closed},"active":true,"archived":false,"enable_order_book":true,"id":"$m","condition_id":"0xM$m","question_id":"0xQ$m","question":"Fixture question $m?","description":"fixture","tokens":[$tokens],"neg_risk":false}"""
      }
      .mkString(",")
    s"""{"timestamp":"$ts","message_type":"active_markets","content":{"count":${spec.nMarkets},"markets":[$markets]}}"""
  }

  private def feedFrame(frameTs: String, escapedMsg: String): String =
    s"""{"timestamp":"$frameTs","message_type":"feed_message","content":"[$escapedMsg]"}"""
}
