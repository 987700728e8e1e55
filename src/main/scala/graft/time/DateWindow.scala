package graft.time

import java.time.{Instant, LocalDate, ZoneId, ZoneOffset}

/** Date window formatting (F6, `helper/date/date.go:11-80`): turn
  * query epoch bounds into `yyyy-MM-dd` partition-filter strings.
  *
  * Three modes mirror the reference's config (`date-format`):
  *   - `default`: the carbon-clickhouse "SlowTimestampToDays" port —
  *     take the date fields in the *local* zone, format them as-is
  *     (broken-symmetric, not always UTC);
  *   - `utc`: plain UTC calendar date;
  *   - `both`: transition-safe widening — `from` takes the MIN of the
  *     local/UTC dates and `until` the MAX, so a half-migrated table
  *     never loses rows.
  */
object DateWindow {

  private def localDate(ts: Long, tz: ZoneId): LocalDate =
    Instant.ofEpochSecond(ts).atZone(tz).toLocalDate

  private def utcDate(ts: Long): LocalDate =
    Instant.ofEpochSecond(ts).atZone(ZoneOffset.UTC).toLocalDate

  def default(ts: Long, tz: ZoneId = ZoneId.systemDefault()): String =
    localDate(ts, tz).toString

  def utc(ts: Long): String = utcDate(ts).toString

  /** min(local, utc) — for the `from` bound in `both` mode. */
  def minBoth(ts: Long, tz: ZoneId = ZoneId.systemDefault()): String = {
    val l = localDate(ts, tz); val u = utcDate(ts)
    (if (l.isBefore(u)) l else u).toString
  }

  /** max(local, utc) — for the `until` bound in `both` mode. */
  def maxBoth(ts: Long, tz: ZoneId = ZoneId.systemDefault()): String = {
    val l = localDate(ts, tz); val u = utcDate(ts)
    (if (l.isAfter(u)) l else u).toString
  }

  /** (fromDate, untilDate) for a mode: "default" | "utc" | "both". */
  def window(from: Long, until: Long, mode: String,
      tz: ZoneId = ZoneId.systemDefault()): (String, String) = mode match {
    case "utc"     => (utc(from), utc(until))
    case "both"    => (minBoth(from, tz), maxBoth(until, tz))
    case "default" => (default(from, tz), default(until, tz))
    case m         => throw new IllegalArgumentException(s"unknown date-format mode: $m")
  }
}
