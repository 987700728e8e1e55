package graft.engine

import scala.util.matching.Regex

import graft.glob.Glob
import graft.model.TimeFrame

/** Pre-plan gates and storage routing — the Spark-native analog of
  * `finder/blacklist.go`, `finder/prefix.go` and
  * `render/data/targets.go:75-132`.
  *
  * These run at plan time on the driver (they look at query strings,
  * not data), so none of them costs a Spark job; routing picks which
  * Delta/parquet table (retention tier) a plan scans.
  */
object Routing {

  // ----------------------------------------------------------------
  // P11: target blacklist (`finder/blacklist.go:17-60`)
  // ----------------------------------------------------------------

  /** A blacklisted query silently returns the empty result (matching
    * the reference's BlacklistFinder, which short-circuits Execute).
    */
  def isBlacklisted(query: String, blacklist: Seq[Regex]): Boolean =
    blacklist.exists(_.findFirstIn(query).isDefined)

  // ----------------------------------------------------------------
  // U3 config overrides: index-reverse / index-reverses
  // (`config/config.go:130-161`, `finder/index.go:81-99`)
  // ----------------------------------------------------------------

  /** Direct/reversed representation setting: `auto` defers to the
    * per-rule overrides and then the dot-count heuristic.
    */
  sealed trait ReverseMode
  object ReverseMode {
    case object Auto extends ReverseMode
    case object Direct extends ReverseMode
    case object Reversed extends ReverseMode

    /** Valid names per `config.IndexReverseNames`. */
    def fromString(s: String): Either[String, ReverseMode] = s match {
      case "auto"     => Right(Auto)
      case "direct"   => Right(Direct)
      case "reversed" => Right(Reversed)
      case other      => Left(s"$other is not valid value for index-reverses.reverse")
    }
  }

  /** One `[[clickhouse.index-reverses]]` rule: every set matcher must
    * hit (prefix AND suffix AND regex); first matching rule wins.
    */
  final case class ReverseRule(
      prefix: String,
      suffix: String,
      regex: Option[Regex],
      mode: ReverseMode) {
    def matches(query: String): Boolean =
      (prefix.isEmpty || query.startsWith(prefix)) &&
        (suffix.isEmpty || query.endsWith(suffix)) &&
        regex.forall(_.findFirstIn(query).isDefined)
  }

  object ReverseRule {
    /** Validating constructor — the reference's `Compile()`
      * (`config.go:446-464`): a rule must carry at least one matcher,
      * the regex must compile, and the mode name must be valid.
      */
    def compile(
        prefix: String = "",
        suffix: String = "",
        regexStr: String = "",
        reverse: String = "auto"): Either[String, ReverseRule] =
      for {
        mode <- ReverseMode.fromString(reverse)
        regex <-
          if (regexStr.isEmpty) Right(None)
          else
            try Right(Some(regexStr.r))
            catch { case e: java.util.regex.PatternSyntaxException => Left(e.getMessage) }
        _ <-
          if (regexStr.isEmpty && prefix.isEmpty && suffix.isEmpty)
            Left("empthy index-use-reverses rule")
          else Right(())
      } yield ReverseRule(prefix, suffix, regex, mode)
  }

  /** The full chooser configuration: a global mode plus ordered
    * per-target rules (consulted only when the global mode is auto).
    */
  final case class ReversePolicy(
      mode: ReverseMode = ReverseMode.Auto,
      rules: Seq[ReverseRule] = Nil)

  /** First matching rule's mode, else auto (`finder/index.go:81-99`). */
  def checkReverses(query: String, rules: Seq[ReverseRule]): ReverseMode =
    rules.find(_.matches(query)).map(_.mode).getOrElse(ReverseMode.Auto)

  // ----------------------------------------------------------------
  // P12: extra-prefix wrapper (`finder/prefix.go:37-130`)
  // ----------------------------------------------------------------

  /** Outcome of matching a find query against the virtual root prefix. */
  sealed trait PrefixMatch
  /** Query can't live under the prefix → empty result. */
  case object PrefixNotMatched extends PrefixMatch
  /** Query is a proper prefix of the virtual root: answer is the next
    * prefix segment as a non-leaf node (e.g. prefix `a.b`, query `a` →
    * `a.`).
    */
  final case class PrefixPartial(part: String) extends PrefixMatch
  /** Query descends below the prefix: run `rest` against storage and
    * re-prepend `prefix.` to every result path.
    */
  final case class PrefixMatched(rest: String) extends PrefixMatch

  /** Match per-segment: each query segment is a glob matched against
    * the literal prefix segment (`prefix.go:46-80`).
    */
  def matchPrefix(prefix: String, query: String): PrefixMatch = {
    if (prefix.isEmpty) return PrefixMatched(query)
    val qs = query.split("\\.", -1)
    val ps = prefix.split("\\.", -1)
    val n = math.min(qs.length, ps.length)
    var i = 0
    while (i < n) {
      if (!("^" + Glob.globToRegexp(qs(i)) + "$").r.pattern.matcher(ps(i)).matches())
        return PrefixNotMatched
      i += 1
    }
    if (qs.length <= ps.length) PrefixPartial(ps.take(qs.length).mkString(".") + ".")
    else PrefixMatched(qs.drop(ps.length).mkString("."))
  }

  /** Prepend the virtual root back onto a result path
    * (`prefix.go:115-117`).
    */
  def absPath(prefix: String, path: String): String =
    if (prefix.isEmpty) path else s"$prefix.$path"

  // ----------------------------------------------------------------
  // P13: data-table routing (`render/data/targets.go:75-132`)
  // ----------------------------------------------------------------

  /** One routing rule: first rule whose bounds and target regexes all
    * accept the request wins. Durations in seconds; 0 = unbounded.
    * `reverse` marks a table that stores dot-reversed paths.
    */
  final case class DataTableRule(
      table: String,
      minInterval: Long = 0,
      maxInterval: Long = 0,
      minAge: Long = 0,
      maxAge: Long = 0,
      targetMatchAll: Option[Regex] = None,
      targetMatchAny: Option[Regex] = None,
      reverse: Boolean = false)

  /** First-match routing over the rule list; `None` reproduces the
    * reference's "data tables is not specified" error condition.
    */
  def selectDataTable(
      rules: Seq[DataTableRule],
      targets: Seq[String],
      tf: TimeFrame,
      now: Long): Option[DataTableRule] =
    rules.find { t =>
      (t.maxInterval == 0 || (tf.until - tf.from) <= t.maxInterval) &&
      (t.minInterval == 0 || (tf.until - tf.from) >= t.minInterval) &&
      (t.maxAge == 0 || tf.from >= now - t.maxAge) &&
      (t.minAge == 0 || tf.until <= now - t.minAge) &&
      t.targetMatchAll.forall(re => targets.forall(s => re.findFirstIn(s).isDefined)) &&
      t.targetMatchAny.forall(re => targets.exists(s => re.findFirstIn(s).isDefined))
    }

  // ----------------------------------------------------------------
  // P14: max-metrics guards (`find/find.go:45-48`,
  // `render/data/multi_target.go:56-69`)
  // ----------------------------------------------------------------

  /** Cap a find answer (0 = unlimited): the reference truncates to
    * `max-metrics-in-find-answer`.
    */
  def capFindAnswer[T](paths: Seq[T], maxMetrics: Int): Seq[T] =
    if (maxMetrics > 0 && paths.length > maxMetrics) paths.take(maxMetrics) else paths

  /** Per-target series guard: exceeding `max-metrics-per-target` is a
    * hard error in the reference (`multi_target.go:62-68`).
    */
  def checkMetricsPerTarget(target: String, count: Int, maxMetrics: Int): Either[String, Unit] =
    if (maxMetrics > 0 && count > maxMetrics)
      Left(s"metrics limit exceeded: $count > $maxMetrics for target $target")
    else Right(())
}
