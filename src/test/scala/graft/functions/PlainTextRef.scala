package graft.functions

/** THIRD implementation of the shared text kernels — plain Scala over
  * plain Strings, written from the documented SPEC rather than by
  * composing either engine's primitives, so the Spark kernels and the
  * DuckDB oracle twins have an implementation to triangulate against
  * that shares none of their machinery (no UTF8String, no
  * java.util.regex, no Column HOFs).
  *
  * The spec being implemented (the one both the Catalyst kernels and
  * the SQL twins intend):
  *   - `trim` strips U+0020 ONLY (Spark's `trim`/`UTF8String.trim`
  *     semantics — a round-11 near-miss class: `\t`/`\n` at the ends
  *     are NOT stripped and mint empty split tokens).
  *   - the whitespace class is Java-regex `\s` = the six ASCII chars
  *     { \t \n \x0B \f \r ' ' } — NOT Unicode whitespace (U+00A0,
  *     U+3000 etc. are word characters). Note RE2 (DuckDB `\s`)
  *     excludes \x0B; no fixture carries a vertical tab, and the
  *     property suite here pins the Spark side to the Java class so
  *     any future \x0B-bearing corpus fails loudly on the gate rather
  *     than silently diverging.
  *   - split keeps Java `split(re, -1)` semantics: splitting "" gives
  *     [""], a leading separator yields an empty first token, trailing
  *     separators yield trailing empty tokens.
  *   - shingles: w-grams of the split tokens joined by single spaces,
  *     fully-empty shingles dropped, first-occurrence-order distinct.
  *   - normalizedText: Unicode-aware lowercase, collapse `\s+` runs to
  *     one space, then trim (U+0020 only).
  *   - trainer pretokenization: the split tokens with empties removed.
  *
  * All iteration is by CODE POINT where case matters (astral-plane
  * letters are single characters to lowercase), and by UTF-16 unit
  * where the spec is byte/char-shaped (the whitespace class is all
  * BMP, so unit-wise scanning is exact).
  */
object PlainTextRef {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** U+0020-only trim (Spark `trim`). */
  def trimSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }

  /** `split(\s+, -1)` by hand: maximal ASCII-whitespace runs separate
    * tokens; empty input → [""], leading run → leading "", trailing
    * run → trailing "".
    */
  def splitWs(s: String): Vector[String] = {
    if (s.isEmpty) return Vector("")
    val out = Vector.newBuilder[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    var sawSep = false
    var first = true
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) {
        if (!sawSep) {
          out += sb.toString; sb.setLength(0)
          sawSep = true; first = false
        }
      } else {
        sb.append(c); sawSep = false
      }
      i += 1
    }
    // token after the last separator (possibly empty = trailing run);
    // when no separator ever fired the single token is the whole string
    if (!first || !sawSep) out += sb.toString
    out.result()
  }

  /** The trim-then-split words relation the shingle kernel consumes. */
  def words(s: String): Vector[String] = splitWs(trimSpaces(s))

  /** Trainer pretokenization: words with empties removed. */
  def tokens(s: String): Vector[String] = words(s).filter(_.nonEmpty)

  /** Distinct w-gram shingles, first-occurrence order, empty shingles
    * dropped (a shingle of only empty tokens joins to "").
    */
  def shingles(s: String, w: Int): Vector[String] = {
    val ws = words(s)
    val n = ws.length - (w - 1)
    if (n < 1) return Vector.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < n) {
      val sh = ws.slice(i, i + w).mkString(" ")
      if (sh.nonEmpty) seen.add(sh)
      i += 1
    }
    import scala.jdk.CollectionConverters._
    seen.iterator().asScala.toVector
  }

  /** Positional (in-order, duplicates kept) w-grams of a token array. */
  def positionalShingles(ws: Seq[String], w: Int): Vector[String] = {
    val n = ws.length - (w - 1)
    if (n < 1) return Vector.empty
    (0 until n).map(i => ws.slice(i, i + w).mkString(" ")).toVector
  }

  /** lowercase → collapse \s+ runs to ' ' → trim(U+0020). Lowercase
    * walks code points so astral-plane capitals (e.g. DESERET) fold
    * like the engines' full-string lowercase does.
    */
  def normalizedText(s: String): String = {
    val lowered = {
      val sb = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        sb.appendCodePoint(Character.toLowerCase(cp))
        i += Character.charCount(cp)
      }
      sb.toString
    }
    val collapsed = {
      val sb = new java.lang.StringBuilder(lowered.length)
      var i = 0
      var inRun = false
      while (i < lowered.length) {
        val c = lowered.charAt(i)
        if (isWs(c)) { if (!inRun) sb.append(' '); inRun = true }
        else { sb.append(c); inRun = false }
        i += 1
      }
      sb.toString
    }
    trimSpaces(collapsed)
  }
}
