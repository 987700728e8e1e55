package graft.time

import java.time.{Duration, Instant, LocalDate, ZoneId, ZonedDateTime}
import java.time.format.DateTimeFormatter
import scala.util.Try

/** Graphite `from`/`until` time grammar (pure).
  *
  * Accepts: epoch seconds, `now`/`rnow` (truncated now), relative
  * offsets (`-1d`, `+2h30min`), named times (`midnight`, `noon`,
  * `teatime`), day words (`today`, `yesterday`, `tomorrow` and their
  * `r`-truncated variants), `HH:MM_YYYYMMDD`, `YYYYMMDD`, `MM/DD/YY`,
  * and `<base><±offset>…` composites like `now-1d+2h`.
  *
  * Reference behavior: `/root/reference/helper/datetime/datetime.go:46-219`
  * (returns 0 for anything unparseable) with interval units per the
  * public carbonapi interval grammar.
  */
object TimeGrammar {

  /** Parse an interval like `1d7h30min` into seconds (sign applied to
    * every component; leading `+`/`-` in the string wins over `sign`).
    */
  def intervalSeconds(s0: String, defaultSign: Int): Option[Long] = {
    if (s0.isEmpty) return None
    var s = s0
    var sign = defaultSign
    if (s.startsWith("-")) { sign = -1; s = s.substring(1) }
    else if (s.startsWith("+")) { sign = 1; s = s.substring(1) }
    if (s.isEmpty) return None
    var total = 0L
    var i = 0
    while (i < s.length) {
      val numStart = i
      while (i < s.length && s.charAt(i).isDigit) i += 1
      if (i == numStart) return None
      // toLong on an unbounded digit run would throw; overflow = unparseable
      val n = Try(s.substring(numStart, i).toLong).getOrElse(return None)
      val unitStart = i
      while (i < s.length && !s.charAt(i).isDigit) i += 1
      val unit = s.substring(unitStart, i)
      val mult = unitMultiplier(unit)
      if (mult < 0) return None
      total += n * mult
    }
    Some(sign * total)
  }

  private def unitMultiplier(u: String): Long = u match {
    case "" | "s" | "sec" | "secs" | "second" | "seconds"  => 1L
    // bare `m` is minutes in the carbonapi interval grammar the
    // reference delegates to (pkg/parser.IntervalString; exercised by
    // `tests/one_table` "midnight+1380m")
    case "m" | "min" | "mins" | "minute" | "minutes"       => 60L
    case "h" | "hour" | "hours"                            => 3600L
    case "d" | "day" | "days"                              => 86400L
    case "w" | "week" | "weeks"                            => 604800L
    case "mon" | "month" | "months"                        => 2592000L
    case "y" | "year" | "years"                            => 31536000L
    case _                                                 => -1L
  }

  private def parseHourMinute(s: String): Option[(Int, Int)] = s match {
    case "midnight" => Some((0, 0))
    case "noon"     => Some((12, 0))
    case "teatime"  => Some((16, 0))
    case other =>
      other.split(":") match {
        case Array(h, m) => Try((h.trim.toInt, m.trim.toInt)).toOption
        case _           => None
      }
  }

  private def truncate(now: Instant, d: Duration): Instant =
    if (d == null || d.isZero) now
    else Instant.ofEpochSecond(now.getEpochSecond - now.getEpochSecond % d.getSeconds)

  def timestampTruncate(ts: Long, truncateSeconds: Long): Long =
    if (ts == 0 || truncateSeconds == 0) ts else ts - ts % truncateSeconds

  private val Ymd = DateTimeFormatter.ofPattern("yyyyMMdd")
  private val Mdy = DateTimeFormatter.ofPattern("MM/dd/yy")

  /** Main entry: a graphite time param → epoch seconds (0 = unparseable
    * / empty, matching the reference's "use default" convention).
    */
  def parse(s0: String, tz: ZoneId, now: Instant, trunc: Duration = Duration.ZERO): Long = {
    if (s0 == null || s0.isEmpty) return 0L
    val s = s0
    if (s.charAt(0) == '-' || s.charAt(0) == '+') {
      val sign = if (s.charAt(0) == '-') -1 else 1
      return intervalSeconds(s, sign).map(now.getEpochSecond + _).getOrElse(0L)
    }
    s match {
      case "now"  => return now.getEpochSecond
      case "rnow" => return truncate(now, trunc).getEpochSecond
      case "midnight" | "noon" | "teatime" =>
        val (h, m) = parseHourMinute(s).get
        return atTime(now, tz, h, m)
      case _ =>
    }
    // plain epoch (8-digit strings are dates, not epochs)
    if (s.forall(_.isDigit) && s.nonEmpty && s.length != 8) {
      return Try(s.toLong).getOrElse(0L)
    }
    val underscored = s.replaceFirst("_", " ")
    val fields = underscored.split("\\s+").filter(_.nonEmpty)
    fields.length match {
      case 1 =>
        val one = fields(0)
        val delim = one.indexWhere(c => c == '+' || c == '-')
        if (delim == -1) baseDatePlusTime(one, "", tz, now, trunc)
        else {
          val ds = one.substring(0, delim)
          var base: ZonedDateTime = ds match {
            case "now" | "today"   => now.atZone(tz)
            case "rnow" | "rtoday" => truncate(now, trunc).atZone(tz)
            case "midnight" | "noon" | "teatime" =>
              // Intentional fix vs the reference: for `noon+1h` the
              // reference calls parseTime on the *whole* string,
              // ignores the error and falls back to 0:00 (so it
              // computes from midnight); we compute from the actual
              // named time. Likewise `HH:MM_noon` applies the named
              // base here instead of silently using the HH:MM field.
              val (h, m) = parseHourMinute(ds).get
              Instant.ofEpochSecond(atTime(now, tz, h, m)).atZone(tz)
            case "yesterday" => now.atZone(tz).minusDays(1)
            case "tomorrow"  => now.atZone(tz).plusDays(1)
            case _           => return 0L
          }
          var rest = one.substring(delim)
          while (rest.nonEmpty) {
            val next = rest.indexWhere(c => c == '+' || c == '-', 1)
            val (term, remaining) =
              if (next == -1) (rest, "") else (rest.substring(0, next), rest.substring(next))
            val offset = intervalSeconds(term, 1)
              .orElse(Try(term.toLong).toOption)
              .getOrElse(return 0L)
            base = base.plusSeconds(offset)
            rest = remaining
          }
          base.toEpochSecond
        }
      case 2 => baseDatePlusTime(fields(1), fields(0), tz, now, trunc)
      case _ => 0L
    }
  }

  /** Plus-arithmetic instead of atTime(h, m): out-of-range fields
    * (`25:00`, `12:60`) normalize forward exactly like Go's time.Date
    * in the reference, instead of throwing DateTimeException.
    */
  private def atTime(now: Instant, tz: ZoneId, hour: Int, minute: Int): Long =
    now.atZone(tz).toLocalDate.atStartOfDay(tz)
      .plusHours(hour.toLong).plusMinutes(minute.toLong).toEpochSecond

  /** `ds` names or formats a date; `ts` optionally carries `HH:MM`
    * (defaulting to midnight).
    */
  private def baseDatePlusTime(
      ds: String, ts: String, tz: ZoneId, now: Instant, trunc: Duration): Long = {
    val date: LocalDate = ds match {
      case "now" | "today"           => now.atZone(tz).toLocalDate
      case "rnow" | "rtoday"         => truncate(now, trunc).atZone(tz).toLocalDate
      case "midnight" | "noon" | "teatime" =>
        val (h, m) = parseHourMinute(ds).get
        return atTime(now, tz, h, m)
      case "yesterday"  => now.atZone(tz).minusDays(1).toLocalDate
      case "ryesterday" => truncate(now, trunc).atZone(tz).minusDays(1).toLocalDate
      case "tomorrow"   => now.atZone(tz).plusDays(1).toLocalDate
      case "rtomorrow"  => truncate(now, trunc).atZone(tz).plusDays(1).toLocalDate
      case other =>
        Try(LocalDate.parse(other, Ymd)).toOption
          .orElse(Try(LocalDate.parse(other, Mdy)).toOption)
          .getOrElse(return 0L)
    }
    val (hour, minute) = if (ts.nonEmpty) parseHourMinute(ts).getOrElse((0, 0)) else (0, 0)
    // plus-arithmetic: out-of-range HH:MM normalizes like Go time.Date
    date.atStartOfDay(tz).plusHours(hour.toLong).plusMinutes(minute.toLong).toEpochSecond
  }
}
