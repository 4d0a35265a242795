package graft.sources

import java.io.{File, FileOutputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

/** GCS wire protocol, spoken directly — the reference shells out to
  * `gcloud storage cp` (`cli/src/gcs_downloader.rs:126-154`); this
  * client implements the JSON API the tool wraps, so the ENTIRE object
  * store wire — listing with pagination, media download, the
  * percent-encoded object-name path — is exercisable in-sandbox
  * against a loopback server, leaving only the production hostname
  * and OAuth header environment-bound (both are parameters here, not
  * assumptions):
  *
  *   - LIST: `GET {base}/storage/v1/b/{bucket}/o?prefix=…&pageToken=…`
  *     → `{"items":[{"name":…,"size":…}], "nextPageToken": …}`,
  *     looped until the token runs out.
  *   - MEDIA: `GET {base}/download/storage/v1/b/{bucket}/o/{object}
  *     ?alt=media` — the object name percent-encoded as ONE path
  *     segment ('/' → %2F, the JSON API's notorious requirement;
  *     spaces → %20, never '+', which is a query-string convention).
  *
  * 404 on media = object absent (a collector-downtime hour) — the
  * fetcher returns false and [[HourCache.fetchMissing]] skips the
  * hour, exactly the reference's per-object failure tolerance.
  */
object GcsJsonClient {

  final case class Obj(name: String, size: Long)

  /** Percent-encode a value as a single URI path segment: URLEncoder
    * is form-encoding — it does produce the %2F the JSON API path
    * needs for '/', but renders spaces as '+', a query-string
    * convention a path segment must not use. Fix that one
    * divergence: '+' → %20.
    */
  def encodeSegment(name: String): String =
    java.net.URLEncoder.encode(name, StandardCharsets.UTF_8).replace("+", "%20")

  private def get(url: String, headers: Map[String, String],
      connectTimeoutMs: Int, readTimeoutMs: Int): HttpURLConnection = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn
  }

  /** All objects under `prefix`, following `nextPageToken` to the end. */
  def listObjects(
      baseUrl: String,
      bucket: String,
      prefix: String,
      headers: Map[String, String] = Map.empty,
      connectTimeoutMs: Int = 3000,
      readTimeoutMs: Int = 10000,
  ): Seq[Obj] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val out = Seq.newBuilder[Obj]
    var token: Option[String] = None
    var more = true
    var pages = 0
    // every token ever seen: a server cycling tokens (A, B, A, …) makes
    // no progress but would evade an unchanged-token-only check. Tokens
    // are opaque with no documented distinctness guarantee, so a
    // recurrence alone is NOT fatal — only a recurrence on a page that
    // delivered no new object names (the progress witness; a valid
    // listing never re-lists a name without new ones alongside).
    val seen = scala.collection.mutable.Set.empty[String]
    val namesSeen = scala.collection.mutable.Set.empty[String]
    val maxPages = 100000 // runaway backstop; real listings are ≤ tens of pages
    while (more) {
      pages += 1
      if (pages > maxPages)
        throw new java.io.IOException(
          s"GCS list: $maxPages pages without exhausting nextPageToken " +
            s"for prefix '$prefix' — server not terminating, aborting")
      val qs = s"prefix=${java.net.URLEncoder.encode(prefix, StandardCharsets.UTF_8)}" +
        token.map(t => s"&pageToken=${java.net.URLEncoder.encode(t, StandardCharsets.UTF_8)}").getOrElse("")
      val conn = get(s"$baseUrl/storage/v1/b/${encodeSegment(bucket)}/o?$qs",
        headers, connectTimeoutMs, readTimeoutMs)
      try {
        if (conn.getResponseCode != 200)
          throw new java.io.IOException(
            s"GCS list: HTTP ${conn.getResponseCode} for prefix '$prefix'")
        val node = mapper.readTree(conn.getInputStream)
        var newNames = 0
        Option(node.get("items")).filter(_.isArray).toSeq
          .flatMap(_.elements().asScala)
          .foreach { o =>
            // `name` is required by the API; a malformed item without
            // one is a protocol error, not an NPE
            val name = Option(o.get("name")).filterNot(_.isNull).map(_.asText())
              .getOrElse(throw new java.io.IOException(
                s"GCS list: item missing 'name' for prefix '$prefix'"))
            if (namesSeen.add(name)) newNames += 1
            out += Obj(name, Option(o.get("size")).map(_.asLong()).getOrElse(0L))
          }
        val next = Option(node.get("nextPageToken")).filterNot(_.isNull).map(_.asText())
        // a REPEATED token (unchanged or cycling) on a page with no
        // new object names means the server is not making progress —
        // looping on it would hang the client. A repeat WITH new names
        // is allowed (opaque tokens may legitimately recur); the
        // maxPages backstop still bounds that path.
        next.foreach { t =>
          if (!seen.add(t) && newNames == 0)
            throw new java.io.IOException(
              s"GCS list: nextPageToken '$t' repeated with no new objects " +
                s"for prefix '$prefix' — server not paginating, aborting")
        }
        token = next
        more = token.isDefined
      } finally conn.disconnect()
    }
    out.result()
  }

  /** Download one object to `dest`; false on 404 (absent), throws on
    * any other non-200 (a transport error must not read as "hour
    * missing").
    */
  def download(
      baseUrl: String,
      bucket: String,
      name: String,
      dest: File,
      headers: Map[String, String] = Map.empty,
      connectTimeoutMs: Int = 3000,
      readTimeoutMs: Int = 30000,
  ): Boolean = {
    val conn = get(
      s"$baseUrl/download/storage/v1/b/${encodeSegment(bucket)}/o/" +
        s"${encodeSegment(name)}?alt=media",
      headers, connectTimeoutMs, readTimeoutMs)
    try {
      conn.getResponseCode match {
        case 200 =>
          val in = conn.getInputStream
          val outS = new FileOutputStream(dest)
          try in.transferTo(outS) finally { outS.close(); in.close() }
          true
        case 404 => false
        case other =>
          throw new java.io.IOException(s"GCS media: HTTP $other for '$name'")
      }
    } finally conn.disconnect()
  }

  /** The [[HourCache.fetchMissing]] plug: hour key → object
    * `{prefix}{hour}.jsonl.zst` under `bucket`.
    */
  def hourFetcher(
      baseUrl: String,
      bucket: String,
      prefix: String,
      headers: Map[String, String] = Map.empty,
  ): (String, File) => Boolean =
    (hour, dest) => download(baseUrl, bucket, s"$prefix$hour.jsonl.zst", dest, headers)
}
