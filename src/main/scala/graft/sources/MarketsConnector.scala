package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.jdk.CollectionConverters._

/** Ingest-side connector logic (SURVEY.md §2.1 S3-S5, §2.7 sharding):
  * REST pagination, market sharding, and connection split policy —
  * re-expressed as pure functions over an injectable fetch, because
  * this environment has zero egress and, more importantly, because
  * everything testable about the reference's connector IS this logic,
  * not the socket plumbing (`collector/src/client/mod.rs`,
  * `connection.rs`).
  *
  * On a cluster this runs driver-side (the reference runs it in one
  * process too); the result becomes a broadcastable dimension.
  */
object MarketsConnector {

  /** One API page (`MarketsApiResponse`, `collector/src/lib.rs:74-80`);
    * `data` carries raw market JSON strings — typed parsing happens in
    * MarketsDim, keeping the open schema intact.
    */
  final case class Page(data: Seq[String], nextCursor: Option[String])

  /** C7: cursor = base64 of the row offset (`encode_number_to_base64`,
    * `mod.rs:363-366`; offset = page × 500, `mod.rs:340-359`).
    */
  def cursorFor(page: Int, pageSize: Int = 500): String =
    Base64.getEncoder.encodeToString(
      (page.toLong * pageSize).toString.getBytes(StandardCharsets.UTF_8))

  /** S3: fetch all markets with windowed concurrent pagination — waves
    * of `concurrency` pages, growing until a wave's tail page comes
    * back non-full (`fetch_markets`, `mod.rs:281-337`: 30 concurrent
    * pages of 500).
    */
  def fetchAllMarkets(
      fetch: String => Page,
      pageSize: Int = 500,
      concurrency: Int = 30,
  )(implicit ec: ExecutionContext): Seq[String] = {
    val acc = Seq.newBuilder[String]
    var page = 0
    var done = false
    while (!done) {
      val wave = (page until page + concurrency).map { p =>
        Future(fetch(cursorFor(p, pageSize)))
      }
      val results = Await.result(Future.sequence(wave), Duration.Inf)
      results.foreach(r => acc ++= r.data)
      done = results.exists(_.data.size < pageSize)
      page += concurrency
    }
    acc.result()
  }

  /** S4: sequential cursor pagination with bounded retry
    * (`fetch_sampling_markets`, `mod.rs:221-250`).
    */
  def fetchAllSequential(
      fetch: String => Page,
      firstCursor: String = cursorFor(0),
      maxRetries: Int = 3,
  ): Seq[String] = {
    val acc = Seq.newBuilder[String]
    var cursor: Option[String] = Some(firstCursor)
    while (cursor.isDefined) {
      var attempt = 0
      var page: Page = null
      while (page == null) {
        try page = fetch(cursor.get)
        catch {
          case e: Exception =>
            attempt += 1
            if (attempt > maxRetries) throw e
        }
      }
      acc ++= page.data
      cursor = page.nextCursor
    }
    acc.result()
  }

  /** The REAL transport for the paginators: GET
    * `$baseUrl?next_cursor=$cursor`, JSON-parse `{data, next_cursor}`
    * (`MarketsApiResponse`, `collector/src/lib.rs:74-80`). Non-200
    * throws — that is [[fetchAllSequential]]'s retry trigger. Injected
    * as the `fetch` argument so tests can also drive the paginators
    * with pure functions; the q_source_markets_http gate runs THIS
    * function against a loopback HTTP server.
    */
  def httpFetch(
      baseUrl: String,
      connectTimeoutMs: Int = 3000,
      readTimeoutMs: Int = 3000,
  )(cursor: String): Page = {
    // base64 cursors can carry '+' and '=' — '+' in a raw query value
    // decodes as a SPACE on standard servers, corrupting the cursor
    // (e.g. 'MTI+MA=='), so the cursor must be URL-encoded
    val enc = java.net.URLEncoder.encode(cursor, java.nio.charset.StandardCharsets.UTF_8)
    val url = java.net.URI.create(s"$baseUrl?next_cursor=$enc").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    try {
      if (conn.getResponseCode != 200)
        throw new java.io.IOException(
          s"HTTP ${conn.getResponseCode} for cursor '$cursor'")
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(conn.getInputStream)
      val data = Option(node.get("data")).filter(_.isArray).toSeq
        .flatMap(_.elements().asScala)
        .map(n => if (n.isTextual) n.asText() else n.toString)
      val next = Option(node.get("next_cursor"))
        .filterNot(_.isNull).map(_.asText())
      Page(data, next)
    } finally conn.disconnect()
  }

  /** Greedy sharding: pack asset ids into connections of at most
    * `maxPerConnection` (`take_chunk`/`build_connections`,
    * `mod.rs:206-218,371-389`; 25 per connection, `mod.rs:9`).
    */
  def shardAssets(assets: Seq[String], maxPerConnection: Int = 25): Seq[Seq[String]] =
    assets.grouped(maxPerConnection).toSeq

  /** Failure-driven split: halve a connection's market set
    * (`split_markets`, `mod.rs:402-408`: split_at(len/2), so the
    * SECOND half keeps the extra element for odd sizes — 5 → (2, 3),
    * 1 → (0, 1), per the reference's own doc examples).
    */
  def splitMarkets[A](markets: Seq[A]): (Seq[A], Seq[A]) = {
    val mid = markets.size / 2
    (markets.take(mid), markets.drop(mid))
  }

  /** Split policy: ≥ `threshold` consecutive failures AND the
    * connection had previously opened AND it carries more than one
    * market (`connection.rs:193-208`; threshold 20 per the code —
    * the reference's own unit test assumes 3 and fails, SURVEY.md §5
    * treats the code as spec).
    */
  def shouldSplit(
      consecutiveFailures: Int,
      previouslyOpened: Boolean,
      nMarkets: Int,
      threshold: Int = 20,
  ): Boolean =
    consecutiveFailures >= threshold && previouslyOpened && nMarkets > 1

  /** S5 subscribe frame for one shard
    * (`Connection::subscribe`, `connection.rs:231-248`): non-empty
    * token ids only (F7).
    */
  def subscribeMessage(assetIds: Seq[String]): String = {
    val ids = assetIds.filter(_.nonEmpty)
      .map(a => "\"" + a.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
    s"""{"type":"MARKET","assets_ids":[${ids.mkString(",")}]}"""
  }
}
