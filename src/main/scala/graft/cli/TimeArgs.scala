package graft.cli

import java.time.{Duration, Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** CLI time-argument parsing (SURVEY.md §2.6 C1-C4), mirroring the
  * reference's semantics:
  *   - `parseTs`: RFC3339 → ISO-no-offset (assumed UTC) → date-only
  *     3-way fallback (`cli/src/main.rs:270-287`)
  *   - `parseDuration`: `"90s" | "30m" | "12h" | "2d"`
  *     (`cli/src/main.rs:243-268`)
  *   - `sinceRange`: `[now-Δ, trunc_hour(now) - 1min]`
  *     (`cli/src/main.rs:259-262`)
  *   - `hourKey`: `yyyy-MM-dd-HH` bucket (`collector/src/main.rs:132-135`)
  * Driver-side Scala, not column functions — these parse arguments,
  * not data.
  */
object TimeArgs {

  def parseTs(s: String): Instant = {
    def rfc3339 = Instant.from(DateTimeFormatter.ISO_OFFSET_DATE_TIME.parse(s))
    def isoNoOffset = LocalDateTime.parse(s).toInstant(ZoneOffset.UTC)
    def dateOnly = LocalDate.parse(s).atStartOfDay(ZoneOffset.UTC).toInstant
    try rfc3339
    catch {
      case _: Exception =>
        try isoNoOffset
        catch { case _: Exception => dateOnly }
    }
  }

  private val DurationRe = """(\d+)([smhd])""".r

  def parseDuration(s: String): Duration = s match {
    case DurationRe(n, "s") => Duration.ofSeconds(n.toLong)
    case DurationRe(n, "m") => Duration.ofMinutes(n.toLong)
    case DurationRe(n, "h") => Duration.ofHours(n.toLong)
    case DurationRe(n, "d") => Duration.ofDays(n.toLong)
    case _ =>
      throw new IllegalArgumentException(
        s"invalid duration '$s' (expected e.g. 90s, 30m, 12h, 2d)")
  }

  def truncHour(t: Instant): Instant =
    t.truncatedTo(java.time.temporal.ChronoUnit.HOURS)

  /** `--since Δ` ⟹ `[now-Δ, trunc_hour(now) - 1min]`. */
  def sinceRange(since: Duration, now: Instant): (Instant, Instant) =
    (now.minus(since), truncHour(now).minus(Duration.ofMinutes(1)))

  private val HourFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd-HH").withZone(ZoneOffset.UTC)

  def hourKey(t: Instant): String = HourFmt.format(t)
}
