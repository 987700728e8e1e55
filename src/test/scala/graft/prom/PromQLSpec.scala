package graft.prom

import org.scalatest.funsuite.AnyFunSuite

/** Parser/formatter kernels of the `/api/v1/query_range` subset
  * (evaluation itself is exercised over HTTP in `HttpApiSpec`).
  */
class PromQLSpec extends AnyFunSuite {

  test("durations") {
    assert(PromQL.durationSec("5m") == Right(300L))
    assert(PromQL.durationSec("90s") == Right(90L))
    assert(PromQL.durationSec("1h") == Right(3600L))
    assert(PromQL.durationSec("2d") == Right(172800L))
    assert(PromQL.durationSec("1500ms") == Right(1L))
    assert(PromQL.durationSec("5x").isLeft)
    assert(PromQL.durationSec("").isLeft)
  }

  test("parse: bare selector, with matchers, range functions") {
    assert(PromQL.parse("metric1") ==
      Right(PromQL.Selector(Seq(("__name__", "=", "metric1")))))
    assert(PromQL.parse("""metric1{tag1="value1"}""") ==
      Right(PromQL.Selector(Seq(("__name__", "=", "metric1"), ("tag1", "=", "value1")))))
    assert(PromQL.parse("""rate(metric1{a=~"b.*"}[5m])""") ==
      Right(PromQL.RangeFn("rate",
        PromQL.Selector(Seq(("__name__", "=", "metric1"), ("a", "=~", "b.*"))), 300L)))
    assert(PromQL.parse("avg_over_time(m[90s])") ==
      Right(PromQL.RangeFn("avg_over_time",
        PromQL.Selector(Seq(("__name__", "=", "m"))), 90L)))
    assert(PromQL.parse("rate(m)").isLeft) // missing range
    assert(PromQL.parse("not_a_fn(m[5m])").isLeft) // unknown fn → selector parse fails
  }

  test("parse: aggregation operators with by-grouping") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    assert(PromQL.parse("sum by (type) (m)") ==
      Right(PromQL.Agg("sum", Seq("type"), sel)))
    assert(PromQL.parse("sum(m) by (type, user)") ==
      Right(PromQL.Agg("sum", Seq("type", "user"), sel)))
    assert(PromQL.parse("count(m)") == Right(PromQL.Agg("count", Nil, sel)))
    assert(PromQL.parse("avg by (a) (rate(m[5m]))") ==
      Right(PromQL.Agg("avg", Seq("a"), PromQL.RangeFn("rate", sel, 300L))))
    // nested aggregation composes
    assert(PromQL.parse("max(sum by (a, b) (m))") ==
      Right(PromQL.Agg("max", Nil, PromQL.Agg("sum", Seq("a", "b"), sel))))
    // agg names that prefix range fns still parse as range fns
    assert(PromQL.parse("sum_over_time(m[90s])") ==
      Right(PromQL.RangeFn("sum_over_time", sel, 90L)))
    assert(PromQL.parse("sum by (__name__) (m)").isLeft)
    assert(PromQL.parse("quantile(m)").isLeft)
  }

  test("parse: topk/bottomk selection, composing with agg and range fns") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    assert(PromQL.parse("topk(3, m)") == Right(PromQL.RankK("topk", 3, sel)))
    assert(PromQL.parse("bottomk(1, rate(m[5m]))") ==
      Right(PromQL.RankK("bottomk", 1, PromQL.RangeFn("rate", sel, 300L))))
    assert(PromQL.parse("topk(2, sum by (a) (m))") ==
      Right(PromQL.RankK("topk", 2, PromQL.Agg("sum", Seq("a"), sel))))
    assert(PromQL.parse("topk(0, m)").isLeft)
    assert(PromQL.parse("topk(m)").isLeft)
  }

  test("parse: stddev/stdvar/quantile aggregations") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    assert(PromQL.parse("stddev by (a) (m)") ==
      Right(PromQL.Agg("stddev", Seq("a"), sel)))
    assert(PromQL.parse("stdvar(m)") == Right(PromQL.Agg("stdvar", Nil, sel)))
    assert(PromQL.parse("quantile(0.9, m)") ==
      Right(PromQL.Quantile(0.9, Nil, sel)))
    assert(PromQL.parse("quantile by (type) (0.5, m)") ==
      Right(PromQL.Quantile(0.5, Seq("type"), sel)))
    assert(PromQL.parse("quantile(1.5, m)").isLeft)
    assert(PromQL.parse("quantile by (__name__) (0.5, m)").isLeft)
    assert(PromQL.parse("group by (a) (m)") ==
      Right(PromQL.Agg("group", Seq("a"), sel)))
  }

  test("parse: binary operators split at depth 0, spaced only") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    val seln = PromQL.Selector(Seq(("__name__", "=", "n")))
    assert(PromQL.parse("m / n") == Right(PromQL.BinOp("/", sel, seln)))
    assert(PromQL.parse("sum by (a) (m) / sum by (a) (n)") ==
      Right(PromQL.BinOp("/",
        PromQL.Agg("sum", Seq("a"), sel), PromQL.Agg("sum", Seq("a"), seln))))
    // left-assoc chain: split at the LAST low-precedence op
    assert(PromQL.parse("m + n - m") ==
      Right(PromQL.BinOp("-", PromQL.BinOp("+", sel, seln), sel)))
    // * binds tighter than +: the + is the top split
    assert(PromQL.parse("m + n * m") ==
      Right(PromQL.BinOp("+", sel, PromQL.BinOp("*", seln, sel))))
    // hyphenated metric names stay selectors (operator must be spaced)
    assert(PromQL.parse("my-metric") ==
      Right(PromQL.Selector(Seq(("__name__", "=", "my-metric")))))
    // ops inside parens/braces/brackets don't split
    assert(PromQL.parse("""rate(m[5m])""") ==
      Right(PromQL.RangeFn("rate", sel, 300L)))
    // scalar operands parse as literals
    assert(PromQL.parse("rate(m[5m]) * 60") ==
      Right(PromQL.BinOp("*", PromQL.RangeFn("rate", sel, 300L), PromQL.Scalar(60.0))))
    assert(PromQL.parse("100 * m") ==
      Right(PromQL.BinOp("*", PromQL.Scalar(100.0), sel)))
  }

  test("parse: comparison operators bind loosest, filter mode") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    val seln = PromQL.Selector(Seq(("__name__", "=", "n")))
    assert(PromQL.parse("m > 10") == Right(PromQL.BinOp(">", sel, PromQL.Scalar(10.0))))
    assert(PromQL.parse("m >= 0.5") == Right(PromQL.BinOp(">=", sel, PromQL.Scalar(0.5))))
    assert(PromQL.parse("m != n") == Right(PromQL.BinOp("!=", sel, seln)))
    // comparison binds looser than arithmetic
    assert(PromQL.parse("m + n > 10") ==
      Right(PromQL.BinOp(">", PromQL.BinOp("+", sel, seln), PromQL.Scalar(10.0))))
    // != inside matcher braces is a matcher, not an operator
    assert(PromQL.parse("""m{k != "v"}""") ==
      Right(PromQL.Selector(Seq(("__name__", "=", "m"), ("k", "!=", "v")))))
  }

  test("parse: offset modifier on instant and range selectors") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    assert(PromQL.parse("m offset 1h") == Right(PromQL.Offset(3600L, sel)))
    assert(PromQL.parse("rate(m[5m] offset 1h)") ==
      Right(PromQL.Offset(3600L, PromQL.RangeFn("rate", sel, 300L))))
    // composes under aggregation and arithmetic (week-over-week ratio)
    assert(PromQL.parse("sum(m offset 1w)") ==
      Right(PromQL.Agg("sum", Nil, PromQL.Offset(604800L, sel))))
    assert(PromQL.parse("m / m offset 1w") ==
      Right(PromQL.BinOp("/", sel, PromQL.Offset(604800L, sel))))
    assert(PromQL.parse("m offset 1x").isLeft)
  }

  test("labelsOf decodes the storage path into sorted labels") {
    assert(PromQL.labelsOf("metric1?tag1=value1&tag2=v2") ==
      Seq("__name__" -> "metric1", "tag1" -> "value1", "tag2" -> "v2"))
    assert(PromQL.labelsOf("plain.name") == Seq("__name__" -> "plain.name"))
    // aggregated series come back nameless or fully label-less
    assert(PromQL.labelsOf("?type=click") == Seq("type" -> "click"))
    assert(PromQL.labelsOf("") == Seq.empty)
  }

  test("fmtValue matches Prometheus short forms") {
    assert(PromQL.fmtValue(2.0) == "2")
    assert(PromQL.fmtValue(2.5) == "2.5")
    assert(PromQL.fmtValue(0.15) == "0.15")
    assert(PromQL.fmtValue(Double.NaN) == "NaN")
    assert(PromQL.fmtValue(Double.PositiveInfinity) == "+Inf")
  }
}
