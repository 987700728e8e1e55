package graft.compiler

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check: seriesByTag argument splitting + condition parsing
  * recover (key, op, value) from generated calls whose VALUES carry
  * the splitter's own syntax — commas, spaces, `=`, the other quote
  * character — mixed across single- and double-quoted args (same
  * seeded sampling bridge as GlobMatchPropertySpec).
  */
class TaggedPropertySpec extends AnyFunSuite {

  private val key = Gen.oneOf(
    Gen.const("name"),
    Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar)))
  // no leading ~ (would read as a regex op), no quote chars in the
  // plain pool — each arg picks the quote its value does not contain
  private val value = Gen.oneOf(
    Gen.choose(1, 8).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9')))),
    Gen.const("a,b , c"), Gen.const("k2=v2"), Gen.const("x = y"),
    Gen.const("seriesByTag(z)"), Gen.const("a.b.*"), Gen.const("it's"),
    Gen.const("say \"hi\""), Gen.const("sp ace"))
  private val op = Gen.oneOf("=", "!=", "=~", "!=~")

  test("parseSeriesByTag recovers terms across 3000 syntax-laden calls") {
    val term = Gen.zip(key, op, value)
    val cases = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, term))
    var seed = Seed(11L)
    var checked = 0
    while (checked < 3000) {
      cases.apply(Gen.Parameters.default, seed).foreach { ts =>
        val args = ts.map { case (k, o, v) =>
          val q = if (v.contains("'")) "\"" else "'"
          // a value containing BOTH quote chars is inexpressible in
          // the grammar (no escaping, like the reference) — the
          // generator pools guarantee one is free
          s"$q$k$o$v$q"
        }
        val query = s"seriesByTag(${args.mkString(", ")})"
        val parsed = Tagged.parseSeriesByTag(query)
        assert(parsed.isRight, s"'$query' -> $parsed")
        val got = parsed.toOption.get.map(t => (t.key, t.op, t.value))
        val want = ts.map { case (k, o, v) =>
          val opE = o match {
            case "="   => Tagged.Op.Eq
            case "!="  => Tagged.Op.Ne
            case "=~"  => Tagged.Op.Match
            case "!=~" => Tagged.Op.NotMatch
          }
          (if (k == "name") "__name__" else k, opE, v.trim)
        }
        assert(got == want, s"'$query': $got != $want")
      }
      checked += 1
      seed = seed.next
    }
  }
}
