package graft.glob

import org.scalatest.funsuite.AnyFunSuite

/** Brace-split rewrite vectors mirroring `finder/split_test.go`. */
class SplitSpec extends AnyFunSuite {

  private def split(q: String, maxNode: Int): List[String] =
    Split.splitQuery(q, maxNode).toOption.get

  test("no braces / unsplittable stay whole") {
    assert(split("a.b.*", 2) == List("a.b.*"))
    // wildcards on both flanks: no split
    assert(split("some.*.{a,b,c}.{first,second}.*.test.metric", 3) ==
      List("some.*.{a,b,c}.{first,second}.*.test.metric"))
    // clean flank too deep for maxNode
    assert(split("some.long.{a,b,c}.{first,second}.*.metric", 1) ==
      List("some.long.{a,b,c}.{first,second}.*.metric"))
  }

  test("direct split when reverse flank has the wildcard") {
    assert(split("some.long.{a,b,c}.{first,second}.*.metric", 2) ==
      List(
        "some.long.a.{first,second}.*.metric",
        "some.long.b.{first,second}.*.metric",
        "some.long.c.{first,second}.*.metric"))
    assert(split("{first,second}.some.metric.*", 3) ==
      List("first.some.metric.*", "second.some.metric.*"))
  }

  test("reverse split when direct flank has the wildcard") {
    assert(split("some.*.{a,b,c}.{first,second}.test.metric", 2) ==
      List(
        "some.*.{a,b,c}.first.test.metric",
        "some.*.{a,b,c}.second.test.metric"))
    assert(split("*.some.metric.{first,second}", 3) ==
      List("*.some.metric.first", "*.some.metric.second"))
  }

  test("clean flanks: deeper side wins; tie → more choices") {
    assert(split("some.long.{a,b,c}.{first,second}.test.metric", 1) ==
      List("some.long.{a,b,c}.{first,second}.test.metric"))
    assert(split("some.very.long.{a,b}.*.{first,second}.metric", 3) ==
      List(
        "some.very.long.a.*.{first,second}.metric",
        "some.very.long.b.*.{first,second}.metric"))
    assert(split("some.{a,b}.*.{first,second}.long.test.metric", 3) ==
      List(
        "some.{a,b}.*.first.long.test.metric",
        "some.{a,b}.*.second.long.test.metric"))
  }

  test("unmatched brackets rejected") {
    assert(Split.splitQuery("a.{b,c", 2).isLeft)
  }
}
