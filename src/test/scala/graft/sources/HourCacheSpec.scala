package graft.sources

import java.io.File
import java.nio.file.Files
import java.time.Instant
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Hour-cache semantics (S6/B4/J2) with an injectable fetcher. */
class HourCacheSpec extends AnyFunSuite {

  test("requiredHours mirrors the reference's inclusive-end hour walk") {
    // un-truncated start, whole-hour steps while current <= end
    // (`gcs_downloader.rs:105-124`): 10:30, 11:30, 12:30 → hours 10-12
    val hs = HourCache.requiredHours(
      Instant.parse("2025-07-01T10:30:00Z"), Instant.parse("2025-07-01T13:00:00Z"))
    assert(hs == Seq("2025-07-01-10", "2025-07-01-11", "2025-07-01-12"))
    // end exactly on an hour boundary fetches that hour's file (a
    // date-only --end parses to midnight; the reference includes it)
    assert(HourCache.requiredHours(
      Instant.parse("2025-07-01T10:00:00Z"), Instant.parse("2025-07-01T12:00:00Z")) ==
      Seq("2025-07-01-10", "2025-07-01-11", "2025-07-01-12"))
    // degenerate start == end still names the covering hour
    assert(HourCache.requiredHours(
      Instant.parse("2025-07-01T10:00:00Z"), Instant.parse("2025-07-01T10:00:00Z")) ==
      Seq("2025-07-01-10"))
    // inverted range is empty
    assert(HourCache.requiredHours(
      Instant.parse("2025-07-01T11:00:00Z"), Instant.parse("2025-07-01T10:00:00Z")).isEmpty)
  }

  test("partitionByCache splits by local existence (B4/J2)") {
    val dir = Files.createTempDirectory("graft_cache").toString
    Files.createFile(new File(dir, "2025-07-01-10.jsonl.zst").toPath)
    val p = HourCache.partitionByCache(dir, Seq("2025-07-01-10", "2025-07-01-11"))
    assert(p.cached == Seq("2025-07-01-10"))
    assert(p.missing == Seq("2025-07-01-11"))
  }

  test("fetchMissing: parallel batches, failures tolerated, partials cleaned") {
    val dir = Files.createTempDirectory("graft_cache").toString
    val calls = new AtomicInteger(0)
    def fetch(hour: String, target: File): Boolean = {
      calls.incrementAndGet()
      if (hour.endsWith("-12")) false // "no object for this hour"
      else {
        Files.writeString(target.toPath, s"data-$hour")
        true
      }
    }
    val hours = Seq("2025-07-01-10", "2025-07-01-11", "2025-07-01-12", "2025-07-01-13")
    val got = HourCache.fetchMissing(dir, hours, fetch, batchSize = 2)
    assert(got.sorted == Seq("2025-07-01-10", "2025-07-01-11", "2025-07-01-13"))
    assert(calls.get() == 4)
    assert(!new File(dir, "2025-07-01-12.jsonl.zst").exists())
  }

  test("ensureRange: cached files are not re-fetched") {
    val dir = Files.createTempDirectory("graft_cache").toString
    Files.writeString(new File(dir, "2025-07-01-10.jsonl.zst").toPath, "already")
    val fetched = new AtomicInteger(0)
    def fetch(hour: String, target: File): Boolean = {
      fetched.incrementAndGet()
      Files.writeString(target.toPath, s"data-$hour")
      true
    }
    val paths = HourCache.ensureRange(dir,
      Instant.parse("2025-07-01T10:00:00Z"), Instant.parse("2025-07-01T11:30:00Z"), fetch)
    assert(paths.map(p => RawLogSource.fileHourOf(p)) ==
      Seq("2025-07-01-10", "2025-07-01-11"))
    assert(fetched.get() == 1) // only the missing hour
  }
}
