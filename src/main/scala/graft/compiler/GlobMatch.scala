package graft.compiler

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

import graft.glob.Glob

/** Compiled graphite glob matcher — a single-pass backtracking matcher
  * over a pre-compiled token tree, replacing `rlike`'s regex engine in
  * the finder's hot path (SURVEY §2.10 optional native Expression).
  *
  * Semantics match `GlobToRegexp` (`pkg/where/where.go:61-72`) for
  * well-formed globs: `*` = any run of non-dot chars, `?` = one
  * non-dot char, `[...]` char class (ranges, `^` negation), `{a,b}`
  * alternation (nested allowed). Globs with commas outside braces
  * (the reference's global `,`→`|` quirk) are not expressible here —
  * the compiler falls back to the regex path for those.
  */
final class GlobMatcher(glob: String, optionalDotAtEnd: Boolean) extends Serializable {

  sealed private trait Tok extends Serializable
  private case class Lit(c: Char) extends Tok
  private case object Star extends Tok
  private case object QMark extends Tok
  private case class Cls(neg: Boolean, singles: Set[Char], ranges: List[(Char, Char)]) extends Tok
  private case class Alt(options: List[List[Tok]]) extends Tok

  /** Commas outside braces can't be tokenized (global `,`→`|`). */
  val expressible: Boolean = {
    var depth = 0
    var ok = !Glob.hasUnmatchedBrackets(glob)
    glob.foreach {
      case '{'             => depth += 1
      case '}'             => depth -= 1
      case ',' if depth == 0 => ok = false
      case _               =>
    }
    ok
  }

  private val toks: List[Tok] = if (expressible) compile(glob) else Nil

  private def compile(g: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    while (i < g.length) {
      g.charAt(i) match {
        case '*' => out += Star; i += 1
        case '?' => out += QMark; i += 1
        case '[' =>
          val close = g.indexOf(']', i + 1)
          require(close > i, s"unterminated [ in $g")
          var body = g.substring(i + 1, close)
          val neg = body.startsWith("^")
          if (neg) body = body.substring(1)
          val singles = Set.newBuilder[Char]
          val ranges = List.newBuilder[(Char, Char)]
          var k = 0
          while (k < body.length) {
            if (k + 2 < body.length && body.charAt(k + 1) == '-') {
              ranges += ((body.charAt(k), body.charAt(k + 2))); k += 3
            } else { singles += body.charAt(k); k += 1 }
          }
          out += Cls(neg, singles.result(), ranges.result())
          i = close + 1
        case '{' =>
          // find matching close, split top-level commas
          var depth = 1
          var k = i + 1
          val opts = List.newBuilder[String]
          var start = i + 1
          while (depth > 0) {
            g.charAt(k) match {
              case '{' => depth += 1
              case '}' =>
                depth -= 1
                if (depth == 0) { opts += g.substring(start, k) }
              case ',' if depth == 1 =>
                opts += g.substring(start, k); start = k + 1
              case _ =>
            }
            k += 1
          }
          out += Alt(opts.result().map(compile))
          i = k
        case c => out += Lit(c); i += 1
      }
    }
    out.result()
  }

  def matches(s: UTF8String): Boolean = matchesString(s.toString)

  def matchesString(s: String): Boolean = expressible && m(toks, s, 0)

  private def m(ts: List[Tok], s: String, j: Int): Boolean = ts match {
    case Nil =>
      j == s.length || (optionalDotAtEnd && j == s.length - 1 && s.charAt(j) == '.')
    case Lit(c) :: rest =>
      j < s.length && s.charAt(j) == c && m(rest, s, j + 1)
    case QMark :: rest =>
      j < s.length && s.charAt(j) != '.' && m(rest, s, j + 1)
    case Cls(neg, singles, ranges) :: rest =>
      j < s.length && {
        val c = s.charAt(j)
        val in = singles.contains(c) || ranges.exists(r => c >= r._1 && c <= r._2)
        (in != neg) && m(rest, s, j + 1)
      }
    case Star :: rest =>
      var k = j
      var ok = m(rest, s, k)
      while (!ok && k < s.length && s.charAt(k) != '.') {
        k += 1
        ok = m(rest, s, k)
      }
      ok
    case Alt(options) :: rest =>
      options.exists(opt => m(opt ::: rest, s, j))
  }
}

/** Boolean Catalyst expression `GlobMatch(path, glob)` with whole-stage
  * codegen: the generated code calls the pre-compiled matcher directly
  * (one reference object, no per-row regex machinery).
  */
case class GlobMatch(
    child: Expression,
    glob: String,
    optionalDotAtEnd: Boolean) extends UnaryExpression with Predicate {

  @transient private lazy val matcher = new GlobMatcher(glob, optionalDotAtEnd)

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    matcher.matches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("globMatcher", matcher, classOf[GlobMatcher].getName)
    defineCodeGen(ctx, ev, c => s"$ref.matches($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GlobMatch =
    copy(child = newChild)

  override def toString: String = s"globmatch($child, '$glob')"
}

object GlobMatch {

  /** Whether the native matcher can express this glob (no top-level
    * commas, balanced brackets).
    */
  def expressible(glob: String): Boolean =
    new GlobMatcher(glob, optionalDotAtEnd = false).expressible

  /** Column wrapper: native matcher when expressible. */
  def column(field: Column, glob: String, optionalDotAtEnd: Boolean): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      GlobMatch(
        org.apache.spark.sql.GraftExpressionBridge.expression(field),
        glob, optionalDotAtEnd))
}
