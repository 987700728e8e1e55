package graft.prom

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check: the PromQL parser recovers matchers, offset, and @
  * from generated selector expressions whose LABEL VALUES contain the
  * parser's own keywords ("offset 5m", "@ 123", "[1h]", "and", "or",
  * braces, parens) — the quote-depth discipline the modifier and
  * binop scanners must hold (same seeded-sampling bridge as
  * GlobMatchPropertySpec).
  */
class PromQLPropertySpec extends AnyFunSuite {

  private val name = Gen.choose(1, 6)
    .flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val plainVal = Gen.choose(1, 8)
    .flatMap(n => Gen.stringOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ '_')))
  // values deliberately containing modifier/operator/selector syntax —
  // legal inside quotes, must never reach the structural scanners
  private val nastyVal = Gen.oneOf(
    "msg offset 5m", "at @ 123", "m[1h]", "a and b", "x or y",
    "sum(rate", "a{b=c}", "paren ) close", "comma, sep", "5m", " lead",
    "trail ")
  private val value = Gen.frequency(2 -> plainVal, 3 -> nastyVal)
  private val op = Gen.oneOf("=", "!=", "=~", "!~")

  private val matcherList: Gen[List[(String, String, String)]] =
    Gen.choose(0, 3).flatMap(n =>
      Gen.listOfN(n, Gen.zip(name, op, value).map { case (l, o, v) => (l, o, v) }))

  private val offsetSec = Gen.oneOf(60L, 300L, 3600L, 86400L)
  private def offsetStr(s: Long) = s match {
    case 60L => "1m"; case 300L => "5m"; case 3600L => "1h"; case _ => "1d"
  }

  test("parser recovers matchers/offset/@ across 3000 keyword-laden selectors") {
    val cases = Gen.zip(name, matcherList, Gen.option(offsetSec),
      Gen.option(Gen.choose(1L, 2000000000L)))
    var seed = Seed(7L)
    var checked = 0
    while (checked < 3000) {
      cases.apply(Gen.Parameters.default, seed).foreach {
        case (metric, ms, off, at) =>
          val braces =
            if (ms.isEmpty) ""
            else ms.map { case (l, o, v) => s"""$l$o"$v"""" }
              .mkString("{", ",", "}")
          val expr = s"$metric$braces" +
            off.map(o => s" offset ${offsetStr(o)}").getOrElse("") +
            at.map(t => s" @ $t").getOrElse("")
          val parsed = PromQL.parse(expr)
          assert(parsed.isRight, s"'$expr' -> $parsed")
          // unwrap modifiers to the selector and check every matcher
          // survived verbatim (plus the implicit __name__)
          def unwrap(e: PromQL.Expr): PromQL.Expr = e match {
            case PromQL.Offset(o, inner) =>
              assert(off.contains(o), s"'$expr' offset $o"); unwrap(inner)
            case PromQL.At(t, inner) =>
              assert(at.contains(t), s"'$expr' at $t"); unwrap(inner)
            case other => other
          }
          val sel = unwrap(parsed.toOption.get)
          val got = sel.matchers.toSet
          val want = (("__name__", "=", metric) :: ms).toSet
          assert(got == want, s"'$expr': $got != $want")
      }
      checked += 1
      seed = seed.next
    }
  }
}
