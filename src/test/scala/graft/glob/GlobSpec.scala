package graft.glob

import org.scalatest.funsuite.AnyFunSuite

/** Vectors mirror /root/reference/pkg/where/match_test.go and where_test.go. */
class GlobSpec extends AnyFunSuite {

  test("clearGlob strips one-element groups") {
    val cases = Seq(
      "a.{a,b}.te{s}t.b" -> "a.{a,b}.test.b",
      "a.{a,b}.te{s,t}*.b" -> "a.{a,b}.te{s,t}*.b",
      "a.{a,b}.test*.b" -> "a.{a,b}.test*.b",
      "a.[b].te{s}t.b" -> "a.b.test.b",
      "a.[ab].te{s,t}*.b" -> "a.[ab].te{s,t}*.b",
      "a.{a,b.}.te{s,t}*.b" -> "a.{a,b.}.te{s,t}*.b",
      "О.[б].те{s}t.b" -> "О.б.теst.b",
      "О.[].те{}t.b" -> "О..теt.b"
    )
    cases.foreach { case (in, want) => assert(Glob.clearGlob(in) == want, s"input: $in") }
  }

  test("hasUnmatchedBrackets") {
    val cases = Seq(
      "a.{a,b.te{s}t.b" -> true,
      "a.{a,b}.te{s}t.b" -> false,
      "a.{a,b}.te{s,t}}*.b" -> true,
      "a.{a,b}.test*.b" -> false,
      "a.a,b}.test*.b" -> true,
      "a.{a,b.test*.b}" -> true,
      "a.[a,b.test*.b]" -> true,
      "a.[a,b].test*.b" -> false,
      "a.[b].te{s}t.b" -> false,
      "a.{[cd],[ef]}.b" -> false,
      "a.[ab].te{s,t}*.b" -> false,
      "a.{a,b.}.te{s,t}*.b" -> true,
      "О.[б].те{s}t.b" -> false,
      "О.[б.теs}t.b" -> true,
      "О.[].те{}t.b" -> false
    )
    cases.foreach { case (in, want) =>
      assert(Glob.hasUnmatchedBrackets(in) == want, s"input: $in")
    }
  }

  test("globToRegexp") {
    assert(Glob.globToRegexp("a.{a,b}.test*.b") == "a[.](a|b)[.]test([^.]*?)[.]b")
    assert(Glob.globToRegexp("x?y") == "x[^.]y")
    assert(Glob.globToRegexp("a$b") == "a[$]b")
  }

  test("glob regexp actually matches path semantics") {
    val re = ("^" + Glob.globToRegexp("a.{a,b}.test*.b") + "$").r
    assert(re.matches("a.a.test.b"))
    assert(re.matches("a.b.testXY.b"))
    assert(!re.matches("a.c.test.b"))
    assert(!re.matches("a.a.test.x.b"))
  }

  test("globExpandSimple expands braces") {
    assert(Glob.globExpandSimple("S{a,b}E") == Right(List("SaE", "SbE")))
    assert(Glob.globExpandSimple("plain") == Right(List("plain")))
    assert(Glob.globExpandSimple("{a,b}.x.{c,d}") ==
      Right(List("a.x.c", "a.x.d", "b.x.c", "b.x.d")))
    assert(Glob.globExpandSimple("a{b,c").isLeft)
    assert(Glob.globExpandSimple("a{}b").isLeft)
  }

  test("wildcard positions and distance") {
    assert(Glob.maxWildcardDistance("a.b.c") == -1)
    assert(Glob.maxWildcardDistance("*.b.c") == 2)
    assert(Glob.maxWildcardDistance("a.b.*") == 2)
    assert(Glob.maxWildcardDistance("a.*.c") == 1)
    assert(Glob.maxWildcardDistance("*") == 0)
    assert(Glob.hasWildcard("a.b*"))
    assert(!Glob.hasWildcard("a.b"))
  }

  test("nonRegexpPrefix") {
    assert(Glob.nonRegexpPrefix("abc") == "abc")
    assert(Glob.nonRegexpPrefix("abc.*") == "abc")
    assert(Glob.nonRegexpPrefix("host=web.*") == "host=web")
    assert(Glob.nonRegexpPrefix("host=a|b") == "host=")
  }

  test("path reverse") {
    assert(Paths.reverse("a.b.c") == "c.b.a")
    assert(Paths.reverse("metric?tag=v") == "metric?tag=v")
    assert(Paths.reverse("single") == "single")
    assert(Paths.level("a.b.c") == 3)
    assert(Paths.level("a.b.") == 2)
    assert(Paths.level("a") == 1)
  }
}
