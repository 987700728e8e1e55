package graft.compiler

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.glob.Glob

/** Property check: the native token matcher and the regex translation
  * agree on arbitrary well-formed globs × paths (seeded generator
  * sampling — the scalatest/scalacheck bridge isn't on the classpath).
  */
class GlobMatchPropertySpec extends AnyFunSuite {

  private val segChar = Gen.oneOf(('a' to 'e') ++ ('0' to '2'))
  private val litSeg = Gen.choose(1, 3).flatMap(n => Gen.stringOfN(n, segChar))

  private val globSeg: Gen[String] = Gen.oneOf(
    litSeg,
    litSeg.map(_ + "*"),
    Gen.const("*"),
    Gen.const("?"),
    litSeg.map(s => s"[${s.distinct}]"),
    Gen.zip(litSeg, litSeg).map { case (a, b) => s"{$a,$b}" },
    Gen.zip(litSeg, litSeg).map { case (a, b) => s"$a?$b*" })

  private val glob: Gen[String] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, globSeg)).map(_.mkString("."))

  private val path: Gen[String] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, litSeg)).map(_.mkString("."))

  test("native matcher ≡ regex translation on 5000 random (glob, path) pairs") {
    val pairs = Gen.zip(glob, path, Gen.oneOf(false, true))
    var seed = Seed(42L)
    var checked = 0
    while (checked < 5000) {
      pairs.apply(Gen.Parameters.default, seed).foreach { case (g, p0, optDot) =>
        if (GlobMatch.expressible(g)) {
          val m = new GlobMatcher(g, optDot)
          val re = ("^" + Glob.globToRegexp(g) + (if (optDot) "[.]?$" else "$")).r
          val p = if (optDot && checked % 3 == 0) p0 + "." else p0
          assert(m.matchesString(p) == re.pattern.matcher(p).matches(),
            s"glob=$g optDot=$optDot path=$p")
          checked += 1
        }
      }
      seed = seed.next
    }
  }
}
