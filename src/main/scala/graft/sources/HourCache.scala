package graft.sources

import java.io.File
import java.time.{Duration, Instant}

import graft.cli.TimeArgs

/** S6/B4/J2 — hour-keyed object cache (`GcsDownloader`,
  * `cli/src/gcs_downloader.rs`): given a time range, compute the
  * required hourly objects, partition them into (cached, missing) by
  * local existence (the reference's anti-join-shaped cache check,
  * `:48-57`), and fetch the missing ones in parallel batches of 4
  * (`BATCH_SIZE`, `:10`).
  *
  * The fetcher is injectable (zero-egress environment; the reference
  * shells out to `gcloud storage cp`). On a real cluster, prefer
  * reading `gs://` URIs directly via the Hadoop connector and let the
  * scan stream — this cache layer exists for the reference's
  * local-replay workflow parity.
  */
object HourCache {

  /** Hour keys for `[start, end]` exactly as the reference computes
    * them (`get_required_files_for_range`, `gcs_downloader.rs:105-124`):
    * iterate from the UN-truncated start in whole-hour steps while
    * `current <= end`, taking each step's hour bucket. Inclusive end:
    * an end falling exactly on an hour boundary (e.g. a date-only
    * `--end` parsed to midnight) fetches that hour's file too —
    * the half-open variant silently dropped up to an hour of data.
    */
  def requiredHours(start: Instant, end: Instant): Seq[String] = {
    val out = Seq.newBuilder[String]
    var t = start
    while (!t.isAfter(end)) {
      out += TimeArgs.hourKey(t)
      t = t.plus(Duration.ofHours(1))
    }
    out.result().distinct
  }

  final case class Partitioned(cached: Seq[String], missing: Seq[String])

  /** B4/J2: split required hours by cache-file existence. */
  def partitionByCache(cacheDir: String, hours: Seq[String]): Partitioned = {
    val (c, m) = hours.partition(h => new File(cacheDir, s"$h.jsonl.zst").exists())
    Partitioned(c, m)
  }

  /** Fetch missing hours in parallel batches (4-wide like the
    * reference), tolerating per-object failure (an hour with no
    * object — collector downtime — is skipped, `gcs_downloader.rs:126-154`).
    * Returns the hours actually fetched.
    */
  def fetchMissing(
      cacheDir: String,
      missing: Seq[String],
      fetch: (String, File) => Boolean,
      batchSize: Int = 4,
  ): Seq[String] = {
    new File(cacheDir).mkdirs()
    missing.grouped(batchSize).flatMap { batch =>
      // within-batch parallelism, batches sequential — the reference's
      // 4-wide `gcloud storage cp` fan-out
      val threads = batch.map { h =>
        val target = new File(cacheDir, s"$h.jsonl.zst")
        val t = new Thread(() => {
          val ok =
            try fetch(h, target)
            catch { case _: Exception => false }
          if (!ok) target.delete(): Unit
        })
        t.start()
        (h, t, target)
      }
      threads.flatMap { case (h, t, target) =>
        t.join()
        if (target.exists()) Some(h) else None
      }
    }.toSeq
  }

  /** Full flow: required → partition → fetch → paths of every hour now
    * present, sorted (the replay input list).
    */
  def ensureRange(
      cacheDir: String,
      start: Instant,
      end: Instant,
      fetch: (String, File) => Boolean,
  ): Seq[String] = {
    val p = partitionByCache(cacheDir, requiredHours(start, end))
    val fetched = fetchMissing(cacheDir, p.missing, fetch)
    (p.cached ++ fetched).sorted.map(h => new File(cacheDir, s"$h.jsonl.zst").getPath)
  }
}
