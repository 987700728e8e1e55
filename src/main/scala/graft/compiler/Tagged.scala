package graft.compiler

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.glob.Glob
import graft.model.FeatureFlags

/** seriesByTag term model + parser + Catalyst predicate compiler.
  *
  * Semantics follow the reference tagged finder
  * (`finder/tagged.go:28-466`): terms are parsed from
  * `seriesByTag('k=v', 'k2=~re', …)` expressions, ordered so the most
  * selective equality becomes the `tag1` primary filter, compiled to
  * a `tag1` predicate (first term) plus `exists(tags, …)` array
  * predicates (remaining terms).
  */
object Tagged {

  sealed abstract class Op(val rank: Int)
  object Op {
    case object Eq extends Op(1)       // k=v
    case object Match extends Op(2)    // k=~re
    case object Ne extends Op(3)       // k!=v
    case object NotMatch extends Op(4) // k!=~re
  }

  final case class Term(
      key: String,
      op: Op,
      value: String,
      hasWildcard: Boolean = false,
      cost: Int = 0,
      nonDefaultCost: Boolean = false) {
    def concat: String = s"$key=$value"
    /** tag glob → SQL-LIKE mask (`*` → `%`), reference `concatMask` */
    def concatMask: String = s"$key=${value.replace("*", "%")}"
  }

  /** Per-tag selectivity costs — configured or derived from the tag1
    * count table (`config.Costs`; `finder/tags_count_querier.go:113-131`).
    * Lower cost = more selective = preferred as the `tag1` filter.
    */
  final case class Costs(cost: Option[Int] = None, valuesCost: Map[String, Int] = Map.empty)

  /** Apply costs to terms (`SetCosts`/`setCost`,
    * `finder/tagged.go:284-300`): a per-value cost hits Eq and Match
    * terms; the per-key cost only non-wildcard Eq.
    */
  def setCosts(terms: List[Term], costs: Map[String, Costs]): List[Term] =
    terms.map { t =>
      costs.get(t.key) match {
        case Some(c) if t.op == Op.Eq || t.op == Op.Match =>
          c.valuesCost.get(t.value) match {
            case Some(vc) => t.copy(cost = vc, nonDefaultCost = true)
            case None if t.op == Op.Eq && !t.hasWildcard && c.cost.isDefined =>
              t.copy(cost = c.cost.get, nonDefaultCost = true)
            case None => t
          }
        case _ => t
      }
    }

  /** Parse the argument list of `seriesByTag('…', '…')`
    * (`finder/tagged.go:370-426`).
    */
  def seriesByTagArgs(query: String): Either[String, List[String]] = {
    val e0 = query.trim
    if (!e0.startsWith("seriesByTag(")) return Left("wrong seriesByTag call")
    if (!e0.endsWith(")")) return Left("wrong seriesByTag call")
    var e = e0.substring("seriesByTag(".length, e0.length - 1)
    val args = List.newBuilder[String]
    while (e.nonEmpty) {
      val c = e.charAt(0)
      if (c == '\'' || c == '"') {
        val close = e.indexOf(c, 1)
        if (close == -1) return Left(s"seriesByTag arg missing quote: $e")
        val arg = e.substring(1, close)
        if (arg.nonEmpty) args += arg
        e = e.substring(close + 1)
      } else if (c == ' ' || c == ',') {
        e = e.substring(1)
      } else {
        return Left(s"seriesByTag arg missing quote: $e")
      }
    }
    Right(args.result())
  }

  /** `k=v` / `k!=v` / `k=~re` / `k!=~re` → Term
    * (`finder/tagged.go:302-366`). `name` aliases `__name__`.
    */
  def parseConditions(
      conditions: List[String],
      flags: FeatureFlags = FeatureFlags()): Either[String, List[Term]] = {
    val terms = conditions.map { s =>
      val eq = s.indexOf('=')
      if (eq < 0) return Left(s"wrong seriesByTag expr: $s")
      var key = s.substring(0, eq).trim
      var value = s.substring(eq + 1).trim
      var opStr = "="
      if (key.nonEmpty && key.endsWith("!")) {
        opStr = "!="
        key = key.dropRight(1).trim
      }
      if (value.nonEmpty && value.startsWith("~")) {
        opStr = opStr + "~"
        value = value.substring(1).trim
      }
      if (key == "name") key = "__name__"
      val op = opStr match {
        case "="   => Op.Eq
        case "!="  => Op.Ne
        case "=~"  => Op.Match
        case "!=~" => Op.NotMatch
        case _     => return Left(s"wrong seriesByTag expr: $s")
      }
      val hasWildcard = op == Op.Eq &&
        (Glob.hasWildcard(value) || (flags.useCarbonBehavior && value.isEmpty))
      Term(key, op, value, hasWildcard)
    }
    Right(terms)
  }

  def parseSeriesByTag(
      query: String,
      flags: FeatureFlags = FeatureFlags()): Either[String, List[Term]] =
    seriesByTagArgs(query).flatMap { args =>
      if (args.isEmpty) Left("not enough arguments for seriesByTag")
      else parseConditions(args, flags)
    }

  /** Number of exact (non-wildcard equality) terms — admission input
    * (`tags-min-in-query`).
    */
  def nonWildcardEqCount(terms: List[Term]): Int =
    terms.count(t => t.op == Op.Eq && !t.hasWildcard)

  /** Base term ordering (`TaggedTermList.Less`, `finder/tagged.go:51-76`)
    * with configured-cost override (`SortTaggedTermsByCost`,
    * `tagged.go:639-672`): by op class, exact-eq before wildcard-eq,
    * `__name__` preferred, then by configured cost.
    *
    * Implemented as a total ordering (`sortBy` on a rank tuple) — the
    * reference's pairwise comparator is not a strict weak order, which
    * would make TimSort throw for 33+ terms. When every term carries a
    * configured (non-default) cost, cost is hoisted above the op-rank
    * comparison, as the reference's all-non-default branch does; the
    * mixed default/non-default pairwise override is approximated by the
    * trailing cost key (deterministic, documented divergence).
    */
  def sortTerms(terms: List[Term]): List[Term] = {
    def wildcardRank(t: Term) = if (t.op == Op.Eq && !t.hasWildcard) 0 else 1
    def nameRank(t: Term) = if (t.key == "__name__") 0 else 1
    if (terms.nonEmpty && terms.forall(_.nonDefaultCost))
      terms.sortBy(t => (t.cost, t.op.rank, wildcardRank(t), nameRank(t)))
    else
      terms.sortBy(t =>
        (t.op.rank, wildcardRank(t), nameRank(t), if (t.nonDefaultCost) t.cost else 0))
  }

  // ---------------------------------------------------------------
  // Predicate compilation
  // ---------------------------------------------------------------

  /** prefix LIKE 'p%' with at-least-one-more-char (`HasPrefixAndNotEq`) */
  private def prefixAndNotEq(col: Column, prefix: String): Column =
    col.startsWith(prefix) && length(col) > prefix.length

  /** Regex term (`=~`) over a single string column; literal-prefix
    * decomposition per `pkg/where/match.go:205-227` + `where.go:99-115`.
    */
  private def matchColumn(col: Column, key: String, value: String): Column = {
    if (value.isEmpty || value == "*") return col.startsWith(s"$key=")
    // invalid regex is a request error, not a runtime failure — the
    // reference surfaces ClickHouse's regex compile error as HTTP 400
    // "Incorrect regex syntax" (`helper/clickhouse/clickhouse.go:87-89`)
    try java.util.regex.Pattern.compile(value)
    catch {
      case _: java.util.regex.PatternSyntaxException =>
        throw new IllegalArgumentException("Incorrect regex syntax")
    }
    val startAnchored = value.startsWith("^")
    val endAnchored = value.endsWith("$")
    // literal-prefix probe over the would-be "key=value" literal
    val expr =
      if (startAnchored && endAnchored) s"$key=${value.substring(1)}"
      else if (startAnchored) s"$key=${value.substring(1)}\\%"
      else s"$key=\\%$value"
    val simplePrefix = Glob.nonRegexpPrefix(expr)
    if (simplePrefix.length == expr.length) return col === expr
    if (simplePrefix.length == expr.length - 1 && expr.endsWith("$")) return col === simplePrefix
    val body = if (value.contains("|")) s"(${stripAnchors(value, startAnchored)})"
               else stripAnchors(value, startAnchored)
    val re =
      if (startAnchored) s"^$key=$body"
      else s"^$key=.*$body"
    if (simplePrefix.isEmpty) col.rlike(re)
    else col.startsWith(simplePrefix) && col.rlike(re)
  }

  private def stripAnchors(value: String, startAnchored: Boolean): String =
    if (startAnchored) value.substring(1) else value

  /** Expand an eq-value through brace expansion into `key=value`
    * literals. A malformed glob is a request error (the reference
    * propagates GlobExpandSimple's error to an HTTP 400,
    * `finder/tagged.go:147-152`) — not a silent empty result.
    */
  private def eqLiterals(term: Term): List[String] =
    Glob.globExpandSimple(term.value) match {
      case Right(vs) if vs.nonEmpty => vs.map(v => s"${term.key}=$v")
      case Right(_)                 => List(term.concat)
      case Left(err)                => throw new IllegalArgumentException(err)
    }

  /** First (most selective) term → predicate on the `tag1` column
    * (`TaggedTermWhere1`, `finder/tagged.go:130-203`). `tagsCol` is
    * needed for the negative/existence special cases.
    */
  def termWhere1(tag1: Column, tagsCol: Column, term: Term, flags: FeatureFlags): Column =
    term.op match {
      case Op.Eq =>
        if (flags.useCarbonBehavior && term.value.isEmpty) {
          // k="" ⇒ the series has no tag k at all
          !exists(tagsCol, x => x.startsWith(s"${term.key}="))
        } else if (term.value.contains("*")) {
          tag1.like(term.concatMask)
        } else {
          eqLiterals(term) match {
            case single :: Nil => tag1 === single
            case many          => tag1.isin(many: _*)
          }
        }
      case Op.Ne =>
        if (term.value.isEmpty) {
          // k!="" ⇒ k exists with non-empty value
          prefixAndNotEq(tag1, s"${term.key}=")
        } else {
          val base = negTermOnTags(tagsCol, term)
          if (flags.dontMatchMissingTags) tag1.startsWith(s"${term.key}=") && base else base
        }
      case Op.Match => matchColumn(tag1, term.key, term.value)
      case Op.NotMatch =>
        val base = !exists(tagsCol, x => matchColumn(x, term.key, term.value))
        if (flags.dontMatchMissingTags) tag1.startsWith(s"${term.key}=") && base else base
    }

  private def negTermOnTags(tagsCol: Column, term: Term): Column =
    if (term.value.contains("*"))
      !exists(tagsCol, x => x.like(term.concatMask))
    else {
      val lits = eqLiterals(term)
      !exists(tagsCol, x => lits.map(l => x === l).reduceLeft(_ || _))
    }

  /** Remaining terms → predicates over the `tags` array column
    * (`TaggedTermWhereN`, `finder/tagged.go:205-282`).
    */
  def termWhereN(tagsCol: Column, term: Term, flags: FeatureFlags): Column =
    term.op match {
      case Op.Eq =>
        if (flags.useCarbonBehavior && term.value.isEmpty) {
          !exists(tagsCol, x => x.startsWith(s"${term.key}="))
        } else if (term.value.contains("*")) {
          exists(tagsCol, x => x.like(term.concatMask))
        } else {
          eqLiterals(term) match {
            case single :: Nil => array_contains(tagsCol, single)
            case many          => many.map(l => array_contains(tagsCol, l)).reduceLeft(_ || _)
          }
        }
      case Op.Ne =>
        if (term.value.isEmpty) {
          exists(tagsCol, x => prefixAndNotEq(x, s"${term.key}="))
        } else {
          val base = negTermOnTags(tagsCol, term)
          if (flags.dontMatchMissingTags)
            exists(tagsCol, x => x.startsWith(s"${term.key}=")) && base
          else base
        }
      case Op.Match =>
        exists(tagsCol, x => matchColumn(x, term.key, term.value))
      case Op.NotMatch =>
        val base = !exists(tagsCol, x => matchColumn(x, term.key, term.value))
        if (flags.dontMatchMissingTags)
          exists(tagsCol, x => x.startsWith(s"${term.key}=")) && base
        else base
    }

  /** Whole term list → one predicate (`TaggedWhere`,
    * `finder/tagged.go:440-465`): first (sorted) term on `tag1`, rest
    * on the `tags` array.
    */
  def wherePredicate(
      tag1: Column,
      tagsCol: Column,
      terms: List[Term],
      flags: FeatureFlags = FeatureFlags()): Column = {
    require(terms.nonEmpty, "empty tagged term list")
    val sorted = sortTerms(terms)
    val head = termWhere1(tag1, tagsCol, sorted.head, flags)
    sorted.tail.foldLeft(head)((acc, t) => acc && termWhereN(tagsCol, t, flags))
  }

  // ---------------------------------------------------------------
  // Path decode (storage form → display form)
  // ---------------------------------------------------------------

  /** `name?k1=v1&k2=v2` (url-escaped) → `name;k1=v1;k2=v2` with tags
    * sorted (`TaggedDecode`, `finder/tagged.go:551-596`). Incomplete
    * tagged paths pass through unchanged.
    */
  def decodePath(path: String): String = {
    val q = path.indexOf('?')
    if (q < 0 || q == path.length - 1) return path
    val name = unescape(path.substring(0, q))
    // limit -1: trailing empty tag components are preserved, as Go's
    // strings.Split does in the reference TaggedDecode
    val tags = path.substring(q + 1).split("&", -1).map(unescape).sorted
    (name +: tags).mkString(";")
  }

  /** Percent-unescape, tolerant of malformed escapes (passes them
    * through verbatim, `finder/unescape.go`).
    */
  def unescape(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    val bytes = new java.io.ByteArrayOutputStream()
    def flushBytes(): Unit = if (bytes.size() > 0) {
      sb.append(new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      bytes.reset()
    }
    var i = 0
    def isHex(c: Char) = c.isDigit || ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F')
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (s.length < i + 3) {
          // truncated escape: rest verbatim (`unescape.go:51-54`)
          flushBytes(); sb.append(s.substring(i)); i = s.length
        } else if (isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
          bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
          i += 3
        } else {
          // malformed escape: all THREE chars verbatim, consumed
          // (`unescape.go:55-57` writes s[i:i+3] and skips past them)
          flushBytes(); sb.append(s.substring(i, i + 3)); i += 3
        }
      } else {
        flushBytes()
        sb.append(c)
        i += 1
      }
    }
    flushBytes()
    sb.toString
  }

  /** Percent-escape the characters that would break the storage form's
    * `?`/`&`/`;`/`=`-delimited structure (plus `%` itself) — the
    * inverse of `unescape`, so `decodePath(encodePath(x)) == x`.
    */
  def escape(s: String): String =
    if (!s.exists(c => c == '%' || c == '&' || c == '?' || c == ';'))  s
    else s.flatMap {
      case '%' => "%25"
      case '&' => "%26"
      case '?' => "%3F"
      case ';' => "%3B"
      case c   => c.toString
    }

  /** Display form → storage form: `name;k=v;…` → `name?k=v&…`
    * (sorted), used at ingest. Tag keys/values are percent-escaped so
    * structural characters survive the round trip.
    */
  def encodePath(display: String): String = {
    val parts = display.split(";", -1)
    if (parts.length <= 1) return display
    val name = escape(parts.head)
    val tags = parts.tail.map { kv =>
      val eq = kv.indexOf('=')
      if (eq < 0) escape(kv)
      else escape(kv.substring(0, eq)) + "=" + escape(kv.substring(eq + 1))
    }.sorted
    name + "?" + tags.mkString("&")
  }
}
