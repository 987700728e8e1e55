package graft.glob

/** Graphite glob grammar utilities (pure, no Spark deps).
  *
  * Behavior follows the reference implementation in
  * `/root/reference/pkg/where/where.go` and `pkg/where/match.go`:
  * wildcard detection (`where.go:75-97`), Grafana brace expansion
  * (`GlobExpandSimple`, `where.go:19-59`), glob→regex translation
  * (`GlobToRegexp`, `where.go:61-72`), one-element group cleanup
  * (`ClearGlob`, `match.go:11-100`), bracket validation
  * (`HasUnmatchedBrackets`, `match.go:102-134`) and literal-prefix
  * extraction from regexes (`NonRegexpPrefix`, `where.go:99-115`).
  */
object Glob {

  private val WildcardChars = "[]{}*?"

  def hasWildcard(target: String): Boolean =
    target.exists(WildcardChars.contains(_))

  /** Index of first wildcard char, or -1. */
  def indexWildcard(target: String): Int =
    target.indexWhere(WildcardChars.contains(_))

  /** Index of last wildcard char, or -1. */
  def indexLastWildcard(target: String): Int =
    target.lastIndexWhere(WildcardChars.contains(_))

  /** Admission-control metric: how deep (in dot-nodes) the query's
    * wildcards sit from either end; -1 when the query has none.
    */
  def maxWildcardDistance(query: String): Int = {
    if (!hasWildcard(query)) return -1
    val first = query.substring(0, indexWildcard(query)).count(_ == '.')
    val last = query.substring(indexLastWildcard(query)).count(_ == '.')
    math.max(first, last)
  }

  /** Translate a graphite glob into an (anchorless) regex body.
    * `.`→`[.]`, `$`→`[$]`, `{a,b}`→`(a|b)`, `?`→`[^.]`, `*`→`([^.]*?)`.
    * Note `,` maps to `|` globally, exactly like the reference.
    */
  def globToRegexp(g: String): String =
    g.replace(".", "[.]")
      .replace("$", "[$]")
      .replace("{", "(")
      .replace("}", ")")
      .replace("?", "[^.]")
      .replace(",", "|")
      .replace("*", "([^.]*?)")

  /** Expand the Grafana multi-value form `S{a,b}E` to `[SaE, SbE]`.
    * Returns Left(error) on malformed/nested braces.
    */
  def globExpandSimple(value: String): Either[String, List[String]] = {
    val out = List.newBuilder[String]
    def expand(value: String, prefix: String): Option[String] = {
      if (value.isEmpty) { out += prefix; return None }
      val start = value.indexWhere(c => c == '{' || c == '}')
      if (start == -1) { out += (prefix + value); return None }
      val end = value.indexOf('}', start) match {
        case -1 => -1
        case e  => e - start
      }
      if (end <= 1) return Some(s"malformed glob: $value")
      if (value.substring(start + 1, start + end).exists(c => c == '{' || c == '}'))
        return Some(s"malformed glob: $value")
      val newPrefix = prefix + value.substring(0, start)
      val postfix =
        if (start + end + 1 < value.length) value.substring(start + end + 1) else ""
      val alts = splitPreserveEmpty(value.substring(start + 1, start + end), ',')
      alts.foldLeft(Option.empty[String]) { (err, v) =>
        err.orElse(expand(postfix, newPrefix + v))
      }
    }
    expand(value, "") match {
      case Some(err) => Left(err)
      case None      => Right(out.result())
    }
  }

  /** split preserving trailing empties (limit -1). */
  private def splitPreserveEmpty(s: String, sep: Char): List[String] =
    s.split(java.util.regex.Pattern.quote(sep.toString), -1).toList

  /** Strip degenerate one-element groups: `te{s}t`→`test`, `[b]`→`b`,
    * `{}`/`[]`→``. Groups containing `.` (or left unclosed) abort the
    * cleanup from that point on, leaving the remainder untouched.
    */
  def clearGlob(query: String): String = {
    var s = query.indexWhere(c => c == '{' || c == '[')
    if (s == -1) return query
    val sb = new StringBuilder
    var p = 0
    var found = false
    var done = false
    while (!done && s != -1) {
      var e = -1
      if (query.charAt(s) == '{') {
        val idx = query.indexWhere(c => c == '}' || c == '.', s)
        if (idx == -1 || query.charAt(idx) == '.') done = true
        else {
          e = idx + 1 // exclusive end after '}'
          val body = query.substring(s + 1, e - 1)
          if (!body.contains(',')) {
            found = true
            sb.append(query.substring(p, s)).append(body)
            p = e
          }
        }
      } else { // '['
        // Intentional divergence from the reference: its bracket branch
        // checks the char one position before the delimiter (an
        // off-by-one in `pkg/where/match.go`), so it keeps cleaning
        // inputs like `[a.b]`/`[.]`. We abort on any '[' group
        // containing a dot — strictly more conservative; downstream
        // predicates are unaffected (uncleaned globs still compile).
        val idx = query.indexWhere(c => c == ']' || c == '.', s + 1)
        if (idx == -1 || query.charAt(idx) == '.') done = true
        else {
          e = idx + 1
          val body = query.substring(s + 1, e - 1)
          if (body.codePointCount(0, body.length) <= 1) {
            found = true
            sb.append(query.substring(p, s)).append(body)
            p = e
          }
        }
      }
      if (!done) {
        if (e >= query.length) done = true
        else {
          s = query.indexWhere(c => c == '{' || c == '[', e)
          if (s == -1) done = true
        }
      }
    }
    if (found) {
      if (p < query.length) sb.append(query.substring(p))
      sb.toString
    } else query
  }

  /** Per-dot-node balanced-bracket validation; `.` inside `{}`/`[]`
    * counts as a node split (dots are not escaped inside groups).
    */
  def hasUnmatchedBrackets(query: String): Boolean = {
    val matching = Map('}' -> '{', ']' -> '[')
    query.split("\\.", -1).exists { node =>
      var stack = List.empty[Char]
      var bad = false
      node.foreach { c =>
        if (!bad) {
          if (c == '{' || c == '[') stack = c :: stack
          else if (c == '}' || c == ']') {
            if (stack.isEmpty || stack.head != matching(c)) bad = true
            else stack = stack.tail
          }
        }
      }
      bad || stack.nonEmpty
    }
  }

  private val RegexSpecial = "\\.+*?()|[]{}^$".toSet

  /** Longest literal prefix of a regex — chars before the first regex
    * metacharacter. A `|` alternation after a `k=`/`k~` prefix keeps
    * only up to the `=`/`~` (tag-expression convention).
    */
  def nonRegexpPrefix(expr: String): String = {
    var i = 0
    while (i < expr.length) {
      val c = expr.charAt(i)
      if (RegexSpecial.contains(c)) {
        if (c == '|' && i + 1 < expr.length) {
          val eq = expr.substring(0, i).lastIndexWhere(ch => ch == '=' || ch == '~')
          if (eq > 0) return expr.substring(0, eq + 1)
        }
        return expr.substring(0, i)
      }
      i += 1
    }
    expr
  }
}

/** Dotted-path helpers (reference: `pkg/reverse/reverse.go:8-67`,
  * `finder/base.go:36-43`).
  */
object Paths {

  /** `a.b.c` → `c.b.a`; tagged paths (containing `?`) are never
    * reversed.
    */
  def reverse(path: String): String =
    if (path.indexOf('?') >= 0) path
    else path.split("\\.", -1).reverse.mkString(".")

  /** Tree depth: number of dot-separated nodes. */
  def level(path: String): Int = {
    val stripped = if (path.endsWith(".")) path.dropRight(1) else path
    stripped.count(_ == '.') + 1
  }
}
