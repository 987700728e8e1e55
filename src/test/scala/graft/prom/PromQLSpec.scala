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
    // whole-second ms convert exactly; sub-second reject (the
    // second-resolution store never silently widens a window)
    assert(PromQL.durationSec("2000ms") == Right(2L))
    assert(PromQL.durationSec("1500ms").isLeft)
    assert(PromQL.durationSec("500ms").isLeft)
    assert(PromQL.durationSec("0ms").isLeft)
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

  test("parse: grouped topk/bottomk (by/without, both modifier positions)") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    assert(PromQL.parse("topk by (job) (2, m)") ==
      Right(PromQL.RankK("topk", 2, sel, Seq("job"))))
    assert(PromQL.parse("topk(2, m) by (job)") ==
      Right(PromQL.RankK("topk", 2, sel, Seq("job"))))
    assert(PromQL.parse("bottomk without (job, env) (1, m)") ==
      Right(PromQL.RankK("bottomk", 1, sel, Seq("job", "env"), without = true)))
    assert(PromQL.parse("topk by (__name__) (2, m)").isLeft)
    assert(PromQL.parse("topk by (job) (0, m)").isLeft)
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
    // negative offset looks ahead of the eval time, like upstream
    assert(PromQL.parse("m offset -5m") == Right(PromQL.Offset(-300L, sel)))
    assert(PromQL.parse("m offset -1x").isLeft)
  }

  test("parse: offset/@ keywords inside label values are not modifiers") {
    // a label value ending in ` offset <x>` / ` @ <x>` must parse as a
    // plain selector — the modifier strip only fires at quote depth 0
    assert(PromQL.parse("""m{msg="retry offset 5m"}""") ==
      Right(PromQL.Selector(Seq(("__name__", "=", "m"), ("msg", "=", "retry offset 5m")))))
    assert(PromQL.parse("""m{msg="at @ 100"}""") ==
      Right(PromQL.Selector(Seq(("__name__", "=", "m"), ("msg", "=", "at @ 100")))))
    // a REAL trailing modifier after such a label still strips
    assert(PromQL.parse("""m{msg="retry offset 5m"} offset 1h""") ==
      Right(PromQL.Offset(3600L,
        PromQL.Selector(Seq(("__name__", "=", "m"), ("msg", "=", "retry offset 5m"))))))
    assert(PromQL.parse("""m{msg="a @ 1"} @ 100""") ==
      Right(PromQL.At(100L,
        PromQL.Selector(Seq(("__name__", "=", "m"), ("msg", "=", "a @ 1"))))))
  }

  test("parse: parenthesized expressions group explicitly") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    val seln = PromQL.Selector(Seq(("__name__", "=", "n")))
    assert(PromQL.parse("(m)") == Right(sel))
    assert(PromQL.parse("(m + n) / m") ==
      Right(PromQL.BinOp("/", PromQL.BinOp("+", sel, seln), sel)))
    assert(PromQL.parse("m / (m + n)") ==
      Right(PromQL.BinOp("/", sel, PromQL.BinOp("+", sel, seln))))
    assert(PromQL.parse("((m))") == Right(sel))
    // `(m) (n)` is not a wrapper — the first paren closes mid-string
    assert(PromQL.parse("(m) (n)").isLeft)
  }

  test("parse: set operators, loosest precedence (or < and/unless < cmp)") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    val seln = PromQL.Selector(Seq(("__name__", "=", "n")))
    assert(PromQL.parse("m and n") == Right(PromQL.SetOp("and", sel, seln)))
    assert(PromQL.parse("m unless n") == Right(PromQL.SetOp("unless", sel, seln)))
    assert(PromQL.parse("m and n or m") ==
      Right(PromQL.SetOp("or", PromQL.SetOp("and", sel, seln), sel)))
    // comparison binds tighter than the set op
    assert(PromQL.parse("m unless n > 10") ==
      Right(PromQL.SetOp("unless", sel,
        PromQL.BinOp(">", seln, PromQL.Scalar(10.0)))))
    // set ops need vector operands
    assert(PromQL.parse("m and 1").isLeft)
    // no grouping allowed for set operators
    assert(PromQL.parse("m and on(a) group_left n").isLeft)
    // but on/ignoring keys are fine
    assert(PromQL.parse("m and on(a) n") ==
      Right(PromQL.SetOp("and", sel, seln,
        PromQL.Matching(on = true, Seq("a"), PromQL.Matching.OneToOne, Nil))))
  }

  test("parse: on/ignoring and group_left/group_right modifiers") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    val seln = PromQL.Selector(Seq(("__name__", "=", "n")))
    assert(PromQL.parse("m / on(job) n") ==
      Right(PromQL.BinOp("/", sel, seln, boolMode = false,
        PromQL.Matching(on = true, Seq("job"), PromQL.Matching.OneToOne, Nil))))
    assert(PromQL.parse("m / ignoring(a, b) n") ==
      Right(PromQL.BinOp("/", sel, seln, boolMode = false,
        PromQL.Matching(on = false, Seq("a", "b"), PromQL.Matching.OneToOne, Nil))))
    assert(PromQL.parse("m / on(job) group_left n") ==
      Right(PromQL.BinOp("/", sel, seln, boolMode = false,
        PromQL.Matching(on = true, Seq("job"), PromQL.Matching.GroupLeft, Nil))))
    assert(PromQL.parse("m / on(job) group_left(ver) n") ==
      Right(PromQL.BinOp("/", sel, seln, boolMode = false,
        PromQL.Matching(on = true, Seq("job"), PromQL.Matching.GroupLeft, Seq("ver")))))
    assert(PromQL.parse("m * on(job) group_right n") ==
      Right(PromQL.BinOp("*", sel, seln, boolMode = false,
        PromQL.Matching(on = true, Seq("job"), PromQL.Matching.GroupRight, Nil))))
    // group modifiers require an on/ignoring clause (like Prometheus)
    assert(PromQL.parse("m / group_left n").isLeft)
    // matching modifiers need vector operands
    assert(PromQL.parse("m / on(job) 5").isLeft)
  }

  test("parse: bool modifier on comparisons; % and ^ operators") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    val seln = PromQL.Selector(Seq(("__name__", "=", "n")))
    assert(PromQL.parse("m > bool 10") ==
      Right(PromQL.BinOp(">", sel, PromQL.Scalar(10.0), boolMode = true)))
    assert(PromQL.parse("m == bool n") ==
      Right(PromQL.BinOp("==", sel, seln, boolMode = true)))
    // bool only applies to comparisons
    assert(PromQL.parse("m + bool n").isLeft)
    assert(PromQL.parse("m % n") == Right(PromQL.BinOp("%", sel, seln)))
    assert(PromQL.parse("m ^ n") == Right(PromQL.BinOp("^", sel, seln)))
    // ^ binds tightest
    assert(PromQL.parse("m * n ^ m") ==
      Right(PromQL.BinOp("*", sel, PromQL.BinOp("^", seln, sel))))
  }

  test("parse: without grouping on aggregations and quantile") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    assert(PromQL.parse("sum without (a, b) (m)") ==
      Right(PromQL.Agg("sum", Seq("a", "b"), sel, without = true)))
    assert(PromQL.parse("avg(m) without (a)") ==
      Right(PromQL.Agg("avg", Seq("a"), sel, without = true)))
    assert(PromQL.parse("quantile without (a) (0.5, m)") ==
      Right(PromQL.Quantile(0.5, Seq("a"), sel, without = true)))
    // without (__name__) is legal (the name is dropped anyway)
    assert(PromQL.parse("sum without (__name__) (m)").isRight)
    assert(PromQL.parse("sum by (__name__) (m)").isLeft)
  }

  test("parse: extended range functions") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    assert(PromQL.parse("delta(m[5m])") ==
      Right(PromQL.RangeFn("delta", sel, 300L)))
    assert(PromQL.parse("irate(m[1m])") ==
      Right(PromQL.RangeFn("irate", sel, 60L)))
    assert(PromQL.parse("changes(m[1h])") ==
      Right(PromQL.RangeFn("changes", sel, 3600L)))
    assert(PromQL.parse("quantile_over_time(0.9, m[5m])") ==
      Right(PromQL.RangeFn("quantile_over_time", sel, 300L, Some(0.9))))
    assert(PromQL.parse("predict_linear(m[1h], 3600)") ==
      Right(PromQL.RangeFn("predict_linear", sel, 3600L, Some(3600.0))))
    assert(PromQL.parse("deriv(m[1h] offset 1h)") ==
      Right(PromQL.Offset(3600L, PromQL.RangeFn("deriv", sel, 3600L))))
    assert(PromQL.parse("quantile_over_time(x, m[5m])").isLeft)
    assert(PromQL.parse("predict_linear(m, 3600)").isLeft)
  }

  test("parse: scalar math functions") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    assert(PromQL.parse("abs(m)") == Right(PromQL.MathFn("abs", Nil, sel)))
    assert(PromQL.parse("round(m, 5)") ==
      Right(PromQL.MathFn("round", Seq(5.0), sel)))
    assert(PromQL.parse("clamp(m, 0, 10)") ==
      Right(PromQL.MathFn("clamp", Seq(0.0, 10.0), sel)))
    assert(PromQL.parse("clamp_min(rate(m[5m]), 0)") ==
      Right(PromQL.MathFn("clamp_min", Seq(0.0),
        PromQL.RangeFn("rate", sel, 300L))))
    // arg-count validation
    assert(PromQL.parse("clamp(m, 0)").isLeft)
    assert(PromQL.parse("abs(m, 1)").isLeft)
  }

  test("parse: absent, label_replace, label_join") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m"), ("job", "=", "x")))
    assert(PromQL.parse("""absent(m{job="x"})""") == Right(PromQL.Absent(sel)))
    assert(PromQL.parse(
      """label_replace(m{job="x"}, "dst", "$1", "src", "(.*)")""") ==
      Right(PromQL.LabelReplace("dst", "$1", "src", "(.*)", sel)))
    assert(PromQL.parse(
      """label_join(m{job="x"}, "dst", "-", "a", "b")""") ==
      Right(PromQL.LabelJoin("dst", "-", Seq("a", "b"), sel)))
    // malformed regex and non-string args are parse errors
    assert(PromQL.parse(
      """label_replace(m, "dst", "$1", "src", "(unclosed")""").isLeft)
    assert(PromQL.parse("""label_replace(m, dst, "$1", "src", ".*")""").isLeft)
  }

  test("parse: subqueries and count_values") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    assert(PromQL.parse("max_over_time(rate(m[5m])[1h:5m])") ==
      Right(PromQL.SubQuery("max_over_time",
        PromQL.RangeFn("rate", sel, 300L), 3600L, Some(300L))))
    // empty step = outer query resolution
    assert(PromQL.parse("min_over_time(m[1h:])") ==
      Right(PromQL.SubQuery("min_over_time", sel, 3600L, None)))
    assert(PromQL.parse("quantile_over_time(0.9, sum(m)[1h:5m])") ==
      Right(PromQL.SubQuery("quantile_over_time",
        PromQL.Agg("sum", Nil, sel), 3600L, Some(300L), Some(0.9))))
    assert(PromQL.parse("rate(m[5m:abc])").isLeft)
    assert(PromQL.parse("""count_values("v", m)""") ==
      Right(PromQL.CountValues("v", sel)))
    assert(PromQL.parse("""count_values("__name__", m)""").isLeft)
    assert(PromQL.parse("count_values(v, m)").isLeft)
  }

  test("parse: time(), vector(), sort/sort_desc") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    assert(PromQL.parse("time()") == Right(PromQL.TimeFn))
    assert(PromQL.parse("vector(0)") == Right(PromQL.VectorLit(0.0)))
    assert(PromQL.parse("time() - m") ==
      Right(PromQL.BinOp("-", PromQL.TimeFn, sel)))
    assert(PromQL.parse("m or vector(0)") ==
      Right(PromQL.SetOp("or", sel, PromQL.VectorLit(0.0))))
    assert(PromQL.parse("sort(m)") == Right(PromQL.Sort(desc = false, sel)))
    assert(PromQL.parse("sort_desc(sum by (a) (m))") ==
      Right(PromQL.Sort(desc = true, PromQL.Agg("sum", Seq("a"), sel))))
    // time() is scalar-like: no set ops, no matching modifiers
    assert(PromQL.parse("time() and m").isLeft)
    assert(PromQL.parse("vector(x)").isLeft)
    assert(PromQL.parse("time(5)").isLeft)
  }

  test("parse: holt_winters and date functions") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    assert(PromQL.parse("holt_winters(m[1h], 0.5, 0.3)") ==
      Right(PromQL.RangeFn("holt_winters", sel, 3600L, Some(0.5), Some(0.3))))
    // upstream's new name parses to the same node
    assert(PromQL.parse("double_exponential_smoothing(m[1h], 0.5, 0.3)") ==
      Right(PromQL.RangeFn("holt_winters", sel, 3600L, Some(0.5), Some(0.3))))
    // smoothing factors must be strictly inside (0, 1)
    assert(PromQL.parse("holt_winters(m[1h], 0, 0.3)").isLeft)
    assert(PromQL.parse("holt_winters(m[1h], 0.5, 1)").isLeft)
    assert(PromQL.parse("hour()") == Right(PromQL.DateFn("hour")))
    assert(PromQL.parse("minute()") == Right(PromQL.DateFn("minute")))
    assert(PromQL.parse("day_of_week()") == Right(PromQL.DateFn("day_of_week")))
    // vector-arg form maps sample values through the component
    assert(PromQL.parse("hour(m)") == Right(PromQL.DateFn("hour",
      Some(PromQL.Selector(Seq(("__name__", "=", "m")))))))
    assert(PromQL.parse("month()") == Right(PromQL.DateFn("month")))
    assert(PromQL.parse("days_in_month()") ==
      Right(PromQL.DateFn("days_in_month")))
    // the maintenance-window idiom parses end to end
    assert(PromQL.parse("m > 50 and on() (hour() >= 6)").isRight)
  }

  test("parse: @ modifier and limitk") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    assert(PromQL.parse("m @ 1704067200") == Right(PromQL.At(1704067200L, sel)))
    assert(PromQL.parse("m @ start()") == Right(PromQL.AtEdge(atStart = true, sel)))
    assert(PromQL.parse("m @ end()") == Right(PromQL.AtEdge(atStart = false, sel)))
    assert(PromQL.parse("rate(m[5m] @ 100)") ==
      Right(PromQL.At(100L, PromQL.RangeFn("rate", sel, 300L))))
    // offset composes inside @ (read relative to the pinned time),
    // whichever order the modifiers are written in
    assert(PromQL.parse("m @ 100 offset 5m") ==
      Right(PromQL.At(100L, PromQL.Offset(300L, sel))))
    assert(PromQL.parse("m offset 5m @ 100") ==
      Right(PromQL.At(100L, PromQL.Offset(300L, sel))))
    assert(PromQL.parse("5 @ 100").isLeft)
    assert(PromQL.parse("m @ nope").isLeft)
    assert(PromQL.parse("limitk(2, m)") == Right(PromQL.LimitK(2, sel)))
    assert(PromQL.parse("limitk(0, m)").isLeft)
  }

  test("parse: histogram_quantile") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    assert(PromQL.parse("histogram_quantile(0.9, m)") ==
      Right(PromQL.HistQuantile(0.9, sel)))
    assert(PromQL.parse("histogram_quantile(0.99, rate(m[5m]))") ==
      Right(PromQL.HistQuantile(0.99, PromQL.RangeFn("rate", sel, 300L))))
    // φ outside [0,1] parses (evaluates to ±Inf, like Prometheus)
    assert(PromQL.parse("histogram_quantile(1.5, m)") ==
      Right(PromQL.HistQuantile(1.5, sel)))
    assert(PromQL.parse("histogram_quantile(x, m)").isLeft)
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

/** Matrix-combinator evaluation vectors for the binary/set/histogram
  * operators, on hand-built (path, t, value) matrices (the full
  * selector→matrix path is exercised over HTTP in `HttpApiSpec` and
  * by the `p_query_*` oracle queries).
  */
class PromQLEvalSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def matrix(rows: (String, Long, Double)*) = {
    import spark.implicits._
    rows.toDF("path", "t", "value")
  }

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Double)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("set operators: and/unless/or keyed per slot") {
    val lm = matrix(("m?a=1", 0L, 1.0), ("m?a=2", 0L, 2.0), ("m?a=1", 60L, 3.0))
    val rm = matrix(("n?a=1", 0L, 9.0))
    assert(rowSet(PromQL.setOpMatrix(lm, rm, "and", PromQL.Matching.default)) ==
      Set(("m?a=1", 0L, 1.0)))
    assert(rowSet(PromQL.setOpMatrix(lm, rm, "unless", PromQL.Matching.default)) ==
      Set(("m?a=2", 0L, 2.0), ("m?a=1", 60L, 3.0)))
    // or: left rows, plus right rows whose key has no left entry then
    val rm2 = matrix(("n?a=1", 0L, 9.0), ("n?a=3", 0L, 7.0))
    assert(rowSet(PromQL.setOpMatrix(lm, rm2, "or", PromQL.Matching.default)) ==
      Set(("m?a=1", 0L, 1.0), ("m?a=2", 0L, 2.0), ("m?a=1", 60L, 3.0),
        ("n?a=3", 0L, 7.0)))
  }

  test("on(...) match key restricts; one-to-one output is the key") {
    val lm = matrix(("m?inst=1&job=x", 0L, 10.0))
    val rm = matrix(("s?job=x", 0L, 5.0))
    val m = PromQL.Matching(on = true, Seq("job"), PromQL.Matching.OneToOne, Nil)
    assert(rowSet(PromQL.binOpMatrix(lm, rm, "/", boolMode = false, m)) ==
      Set(("?job=x", 0L, 2.0)))
    // ignoring(inst) keys on the remaining labels (job)
    val mi = PromQL.Matching(on = false, Seq("inst"), PromQL.Matching.OneToOne, Nil)
    assert(rowSet(PromQL.binOpMatrix(lm, rm, "/", boolMode = false, mi)) ==
      Set(("?job=x", 0L, 2.0)))
  }

  test("group_left: many-to-one with include labels from the one side") {
    val lm = matrix(("m?inst=1&job=x", 0L, 10.0), ("m?inst=2&job=x", 0L, 20.0))
    val rm = matrix(("s?job=x&ver=2", 0L, 5.0))
    val m = PromQL.Matching(on = true, Seq("job"), PromQL.Matching.GroupLeft, Nil)
    assert(rowSet(PromQL.binOpMatrix(lm, rm, "/", boolMode = false, m)) ==
      Set(("?inst=1&job=x", 0L, 2.0), ("?inst=2&job=x", 0L, 4.0)))
    val minc = PromQL.Matching(on = true, Seq("job"), PromQL.Matching.GroupLeft, Seq("ver"))
    assert(rowSet(PromQL.binOpMatrix(lm, rm, "/", boolMode = false, minc)) ==
      Set(("?inst=1&job=x&ver=2", 0L, 2.0), ("?inst=2&job=x&ver=2", 0L, 4.0)))
    // group_right mirrors: many side on the right
    val mr = PromQL.Matching(on = true, Seq("job"), PromQL.Matching.GroupRight, Nil)
    assert(rowSet(PromQL.binOpMatrix(rm, lm, "/", boolMode = false, mr)) ==
      Set(("?inst=1&job=x", 0L, 0.5), ("?inst=2&job=x", 0L, 0.25)))
  }

  test("bool comparisons emit 0/1 with arithmetic label handling") {
    val lm = matrix(("m?a=1", 0L, 10.0), ("m?a=2", 0L, 1.0))
    val rm = matrix(("n?a=1", 0L, 5.0), ("n?a=2", 0L, 5.0))
    assert(rowSet(PromQL.binOpMatrix(lm, rm, ">", boolMode = true, PromQL.Matching.default)) ==
      Set(("?a=1", 0L, 1.0), ("?a=2", 0L, 0.0)))
    // filter mode dedups a duplicate right key deterministically (max)
    val rdup = matrix(("n?a=1", 0L, 5.0), ("o?a=1", 0L, 50.0))
    assert(rowSet(PromQL.binOpMatrix(lm, rdup, ">", boolMode = false, PromQL.Matching.default)) ==
      Set.empty[(String, Long, Double)]) // 10 > max(5, 50) fails
  }

  test("math functions: value transform, name dropped, edge semantics") {
    val m = matrix(("m?a=1", 0L, -1.5), ("m?a=2", 0L, 2.5))
    assert(rowSet(PromQL.mathFnMatrix(m, "abs", Nil)) ==
      Set(("?a=1", 0L, 1.5), ("?a=2", 0L, 2.5)))
    assert(rowSet(PromQL.mathFnMatrix(m, "floor", Nil)) ==
      Set(("?a=1", 0L, -2.0), ("?a=2", 0L, 2.0)))
    assert(rowSet(PromQL.mathFnMatrix(m, "ceil", Nil)) ==
      Set(("?a=1", 0L, -1.0), ("?a=2", 0L, 3.0)))
    // Go-style round: half away from zero only for the positive half
    // (floor(v/to + 0.5)*to), to_nearest scaling
    assert(rowSet(PromQL.mathFnMatrix(m, "round", Seq(1.0))) ==
      Set(("?a=1", 0L, -1.0), ("?a=2", 0L, 3.0)))
    assert(rowSet(PromQL.mathFnMatrix(m, "round", Seq(5.0))) ==
      Set(("?a=1", 0L, 0.0), ("?a=2", 0L, 5.0)))
    assert(rowSet(PromQL.mathFnMatrix(m, "clamp", Seq(0.0, 2.0))) ==
      Set(("?a=1", 0L, 0.0), ("?a=2", 0L, 2.0)))
    assert(rowSet(PromQL.mathFnMatrix(m, "sgn", Nil)) ==
      Set(("?a=1", 0L, -1.0), ("?a=2", 0L, 1.0)))
    // ln(0) = -Inf, ln(<0) = NaN — Prometheus, not SQL NULL
    val z = matrix(("m?x=z", 0L, 0.0), ("m?x=n", 0L, -1.0), ("m?x=e", 0L, math.E))
    val ln = rowSet(PromQL.mathFnMatrix(z, "ln", Nil)).map(r => r._1 -> r._3).toMap
    assert(ln("?x=z") == Double.NegativeInfinity)
    assert(ln("?x=n").isNaN)
    assert(math.abs(ln("?x=e") - 1.0) < 1e-12)
    // sqrt(<0) = NaN
    assert(rowSet(PromQL.mathFnMatrix(matrix(("m", 0L, -4.0)), "sqrt", Nil))
      .head._3.isNaN)
    // clamp with lo > hi = NaN (Prometheus), NaN passes through clamp
    assert(rowSet(PromQL.mathFnMatrix(m, "clamp", Seq(3.0, 1.0))).forall(_._3.isNaN))
  }

  test("aggMatrix without: group key is everything but the listed labels") {
    val m = matrix(
      ("m?type=a&user=1", 0L, 1.0), ("m?type=a&user=2", 0L, 2.0),
      ("m?type=b&user=1", 0L, 5.0))
    assert(rowSet(PromQL.aggMatrix(m, "sum", Seq("user"), without = true)) ==
      Set(("?type=a", 0L, 3.0), ("?type=b", 0L, 5.0)))
    // without an absent label = full label set sans name
    assert(rowSet(PromQL.aggMatrix(m, "count", Seq("zzz"), without = true)) ==
      Set(("?type=a&user=1", 0L, 1.0), ("?type=a&user=2", 0L, 1.0),
        ("?type=b&user=1", 0L, 1.0)))
  }

  test("label_replace and label_join rewrite paths in place") {
    val m = matrix(("m?src=abc&z=1", 0L, 1.0), ("m?src=xyz&z=1", 0L, 2.0))
    // anchored match on src: only abc matches a(.*) → dst=b-bc
    assert(rowSet(PromQL.labelReplaceMatrix(m, "dst", "b-$1", "src", "a(.*)")) ==
      Set(("m?dst=b-bc&src=abc&z=1", 0L, 1.0), ("m?src=xyz&z=1", 0L, 2.0)))
    // empty replacement removes the label; overwriting an existing one
    val m2 = matrix(("m?a=1&b=2", 0L, 1.0))
    assert(rowSet(PromQL.labelReplaceMatrix(m2, "b", "", "a", "1")) ==
      Set(("m?a=1", 0L, 1.0)))
    // dst = __name__ renames the metric
    assert(rowSet(PromQL.labelReplaceMatrix(m2, "__name__", "renamed", "a", "1")) ==
      Set(("renamed?a=1&b=2", 0L, 1.0)))
    // src = __name__ reads the name
    assert(rowSet(PromQL.labelReplaceMatrix(m2, "c", "$1", "__name__", "(m)")) ==
      Set(("m?a=1&b=2&c=m", 0L, 1.0)))
    // label_join: unconditional, missing sources join as empty
    assert(rowSet(PromQL.labelJoinMatrix(m2, "j", "-", Seq("a", "b"))) ==
      Set(("m?a=1&b=2&j=1-2", 0L, 1.0)))
    assert(rowSet(PromQL.labelJoinMatrix(m2, "j", "-", Seq("a", "nope"))) ==
      Set(("m?a=1&b=2&j=1-", 0L, 1.0)))
  }

  test("extended range functions over a tiny series") {
    // samples at t = 0, 10, 20, 30: values 1, 3, 2, 5
    val pts = matrix(
      ("m?job=a", 0L, 1.0), ("m?job=a", 10L, 3.0),
      ("m?job=a", 20L, 2.0), ("m?job=a", 30L, 5.0))
      .withColumnRenamed("t", "time")
    val tags = graft.engine.GraphiteTables.expandTagRows(
      pts.select(org.apache.spark.sql.functions.col("path"))
        .distinct()
        .withColumn("date", org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    def eval(q: String): Set[(String, Long, Double)] = rowSet(PromQL.evalMatrix(
      pts, tags, PromQL.parse(q).toOption.get, 30L, 30L, 1L, lookbackSec = 40L))
    // delta extrapolates like upstream: inc=4 over sampled=30 of the
    // 40s window, dStart=10 (< 1.1·avgDur), dEnd=0 → factor 4/3
    assert(eval("delta(m[40s])") == Set(("m?job=a", 30L, 4.0 * 4.0 / 3.0)))
    assert(eval("idelta(m[40s])") == Set(("m?job=a", 30L, 3.0)))
    // irate: (5 - 2) / (30 - 20)
    assert(eval("irate(m[40s])") == Set(("m?job=a", 30L, 0.3)))
    assert(eval("resets(m[40s])") == Set(("m?job=a", 30L, 1.0)))
    assert(eval("changes(m[40s])") == Set(("m?job=a", 30L, 3.0)))
    // least squares over tc = (-30,-20,-10,0), v = (1,3,2,5):
    // slope = 0.11, intercept at slot = 4.4
    val d = eval("deriv(m[40s])")
    assert(d.size == 1 && math.abs(d.head._3 - 0.11) < 1e-12)
    val p = eval("predict_linear(m[40s], 10)")
    assert(p.size == 1 && math.abs(p.head._3 - 5.5) < 1e-12)
    assert(eval("stddev_over_time(m[40s])").head._3 ==
      math.sqrt((Seq(1.0, 3.0, 2.0, 5.0).map(v => (v - 2.75) * (v - 2.75)).sum) / 4))
    assert(eval("present_over_time(m[40s])") == Set(("m?job=a", 30L, 1.0)))
    // first/last bracket the window: earliest sample 1.0, latest 5.0
    assert(eval("first_over_time(m[40s])") == Set(("m?job=a", 30L, 1.0)))
    assert(eval("last_over_time(m[40s])") == Set(("m?job=a", 30L, 5.0)))
    // quantile_over_time: exact interpolation over {1,2,3,5} at 0.5
    assert(eval("quantile_over_time(0.5, m[40s])") == Set(("m?job=a", 30L, 2.5)))
    // irate counter reset: last < prev → last value is the increase
    val pts2 = matrix(("c", 0L, 10.0), ("c", 10L, 2.0))
      .withColumnRenamed("t", "time")
    val tags2 = graft.engine.GraphiteTables.expandTagRows(
      pts2.select(org.apache.spark.sql.functions.col("path")).distinct()
        .withColumn("date", org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    val ir = rowSet(PromQL.evalMatrix(
      pts2, tags2, PromQL.parse("irate(c[20s])").toOption.get,
      10L, 10L, 1L, lookbackSec = 20L))
    assert(ir == Set(("c", 10L, 0.2))) // 2 / 10
  }

  test("count_values groups by Prometheus-formatted value") {
    val m = matrix(
      ("m?a=1", 0L, 2.0), ("m?a=2", 0L, 2.0), ("m?a=3", 0L, 2.5),
      ("m?a=1", 30L, 2.0))
    assert(rowSet(PromQL.countValuesMatrix(m, "v")) ==
      Set(("?v=2", 0L, 2.0), ("?v=2.5", 0L, 1.0), ("?v=2", 30L, 1.0)))
  }

  test("subquery: inner grid aligned to step multiples, outer window aggregate") {
    // samples every 10s; subquery inner step 20s, outer window 60s
    val pts = matrix(
      (0L to 9L).map(i => ("m?job=a", i * 10L, i.toDouble)): _*)
      .withColumnRenamed("t", "time")
    val tags = graft.engine.GraphiteTables.expandTagRows(
      pts.select(org.apache.spark.sql.functions.col("path")).distinct()
        .withColumn("date", org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    // inner instant eval at t = 40, 60, 80 (multiples of 20 in (30, 90])
    // gives values 4, 6, 8; max_over_time over the trailing 60s at 90
    val out = rowSet(PromQL.evalMatrix(
      pts, tags,
      PromQL.parse("max_over_time(m[60s:20s])").toOption.get,
      90L, 90L, 1L, lookbackSec = 300L))
    assert(out == Set(("m?job=a", 90L, 8.0)))
    // min over the same inner points
    assert(rowSet(PromQL.evalMatrix(
      pts, tags,
      PromQL.parse("min_over_time(m[60s:20s])").toOption.get,
      90L, 90L, 1L, lookbackSec = 300L)) == Set(("m?job=a", 90L, 4.0)))
    // empty inner step inherits the outer resolution (30s → 60, 90)
    assert(rowSet(PromQL.evalMatrix(
      pts, tags,
      PromQL.parse("min_over_time(m[60s:])").toOption.get,
      90L, 90L, 30L, lookbackSec = 300L)) == Set(("m?job=a", 90L, 6.0)))
  }

  test("time() and vector(): per-slot scalars and the or-fallback") {
    val pts = matrix(("m?job=a", 0L, 7.0)).withColumnRenamed("t", "time")
    val tags = graft.engine.GraphiteTables.expandTagRows(
      pts.select(org.apache.spark.sql.functions.col("path")).distinct()
        .withColumn("date", org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    def eval(q: String, start: Long = 0L, end: Long = 60L) = rowSet(
      PromQL.evalMatrix(pts, tags, PromQL.parse(q).toOption.get,
        start, end, 30L, lookbackSec = 10L))
    // vector(v): one label-less series across the grid
    assert(eval("vector(2.5)") ==
      Set(("", 0L, 2.5), ("", 30L, 2.5), ("", 60L, 2.5)))
    // standalone time(): value = slot stamp
    assert(eval("time()") == Set(("", 0L, 0.0), ("", 30L, 30.0), ("", 60L, 60.0)))
    // element-wise: time() - m at slot 0 (m stale past 10s lookback)
    assert(eval("time() - m") == Set(("?job=a", 0L, -7.0)))
    // the Grafana no-data fallback: m's only slot is 0, vector(0)
    // fills the rest (empty label set on both sides)
    assert(eval("sum(m) or vector(0)") ==
      Set(("", 0L, 7.0), ("", 30L, 0.0), ("", 60L, 0.0)))
  }

  test("parse: scalar-only expressions, pi(), timestamp(), scalar(), trig") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    // scalar-only arithmetic parses (no longer rejected)
    assert(PromQL.parse("1 + 2") ==
      Right(PromQL.BinOp("+", PromQL.Scalar(1.0), PromQL.Scalar(2.0))))
    assert(PromQL.parse("pi()") == Right(PromQL.Scalar(math.Pi)))
    assert(PromQL.parse("2 * pi()") ==
      Right(PromQL.BinOp("*", PromQL.Scalar(2.0), PromQL.Scalar(math.Pi))))
    // scalar comparisons require bool, like Prometheus
    assert(PromQL.parse("1 > 2").isLeft)
    assert(PromQL.parse("1 > bool 2") ==
      Right(PromQL.BinOp(">", PromQL.Scalar(1.0), PromQL.Scalar(2.0), boolMode = true)))
    assert(PromQL.parse("time() > 100").isLeft)
    // timestamp()/scalar() wrap vectors, reject scalars
    assert(PromQL.parse("timestamp(m)") == Right(PromQL.TimestampFn(sel)))
    assert(PromQL.parse("scalar(m)") == Right(PromQL.ScalarFn(sel)))
    assert(PromQL.parse("timestamp(1 + 2)").isLeft)
    assert(PromQL.parse("scalar(2)").isLeft)
    // trig are plain math functions
    assert(PromQL.parse("sin(m)") == Right(PromQL.MathFn("sin", Nil, sel)))
    assert(PromQL.parse("deg(atan(m))") ==
      Right(PromQL.MathFn("deg", Nil, PromQL.MathFn("atan", Nil, sel))))
  }

  test("eval: scalar-only grids, scalar(), timestamp(), trig values") {
    val pts = matrix(
      ("m?x=1", 0L, 3.0), ("m?x=1", 30L, 4.0), ("m?x=2", 30L, 6.0),
      ("solo", 0L, 7.0), ("solo", 30L, 8.0))
      .withColumnRenamed("t", "time")
    val tags = graft.engine.GraphiteTables.expandTagRows(
      pts.select(org.apache.spark.sql.functions.col("path")).distinct()
        .withColumn("date", org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    def eval(q: String, lookback: Long = 10L) = rowSet(PromQL.evalMatrix(
      pts, tags, PromQL.parse(q).toOption.get, 0L, 60L, 30L,
      lookbackSec = lookback))
    // scalar-only arithmetic: one label-less grid series, no scan
    assert(eval("1 + 2") == Set(("", 0L, 3.0), ("", 30L, 3.0), ("", 60L, 3.0)))
    assert(eval("2 * pi()").forall(_._3 == 2 * math.Pi))
    assert(eval("time() / 30 + 1") ==
      Set(("", 0L, 1.0), ("", 30L, 2.0), ("", 60L, 3.0)))
    assert(eval("1 > bool 2").forall(_._3 == 0.0))
    // scalar(solo): exactly one series → its value; NaN where stale
    assert(eval("scalar(solo)").filterNot(r => r._3.isNaN) ==
      Set(("", 0L, 7.0), ("", 30L, 8.0)))
    assert(eval("scalar(solo)").count(_._3.isNaN) == 1) // slot 60 stale
    // scalar(m): two series at slot 30 → NaN there
    assert(eval("scalar(m)").count(_._3.isNaN) == 2) // slots 30 (2 series), 60 (0)
    assert(eval("scalar(m)").contains(("", 0L, 3.0)))
    // vector / scalar() joins per slot: m at 30 / solo at 30 = v/8
    assert(eval("m / scalar(solo)") ==
      Set(("?x=1", 0L, 3.0 / 7.0), ("?x=1", 30L, 4.0 / 8.0), ("?x=2", 30L, 6.0 / 8.0)))
    // timestamp(sel): the raw latest-sample time, name dropped
    assert(eval("timestamp(m)", lookback = 40L) ==
      Set(("?x=1", 0L, 0.0), ("?x=1", 30L, 30.0), ("?x=1", 60L, 30.0),
        ("?x=2", 30L, 30.0), ("?x=2", 60L, 30.0)))
    // timestamp over a derived vector: stamps are the slot times
    assert(eval("timestamp(sum(solo))", lookback = 40L) ==
      Set(("", 0L, 0.0), ("", 30L, 30.0), ("", 60L, 60.0)))
    // trig: sin(solo at 0) = sin(7), deg/rad round-trip
    assert(eval("sin(solo)").exists(r =>
      r._2 == 0L && math.abs(r._3 - math.sin(7.0)) < 1e-12))
    assert(eval("rad(deg(solo))").exists(r =>
      r._2 == 0L && math.abs(r._3 - 7.0) < 1e-12))
  }

  test("parse+eval: absent_over_time, mad_over_time, atan2") {
    val sel = PromQL.Selector(Seq(("__name__", "=", "m")))
    val seln = PromQL.Selector(Seq(("__name__", "=", "n")))
    assert(PromQL.parse("absent_over_time(m[5m])") ==
      Right(PromQL.RangeFn("absent_over_time", sel, 300L)))
    assert(PromQL.parse("mad_over_time(m[5m])") ==
      Right(PromQL.RangeFn("mad_over_time", sel, 300L)))
    // atan2 binds at the multiplicative tier: a + b atan2 c splits at +
    assert(PromQL.parse("m atan2 n") ==
      Right(PromQL.BinOp("atan2", sel, seln)))
    assert(PromQL.parse("m + n atan2 n") ==
      Right(PromQL.BinOp("+", sel, PromQL.BinOp("atan2", seln, seln))))

    val pts = matrix(
      ("m?job=a", 0L, 1.0), ("m?job=a", 10L, 5.0), ("m?job=a", 20L, 2.0),
      ("m?job=a", 30L, 9.0))
      .withColumnRenamed("t", "time")
    val tags = graft.engine.GraphiteTables.expandTagRows(
      pts.select(org.apache.spark.sql.functions.col("path")).distinct()
        .withColumn("date", org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    def eval(q: String, start: Long = 0L, end: Long = 60L, step: Long = 30L) =
      rowSet(PromQL.evalMatrix(pts, tags, PromQL.parse(q).toOption.get,
        start, end, step, lookbackSec = 10L))
    // absent_over_time: window (t-20, t] at t=60 holds nothing; the
    // labels come from the eq matchers
    assert(eval("""absent_over_time(m{job="a"}[20s])""") ==
      Set(("?job=a", 60L, 1.0)))
    // a matching window is absent-free
    assert(eval("""absent_over_time(m{job="a"}[40s])""").isEmpty)
    // mad_over_time over (1,5,2,9) at t=30: median 3.5 → deviations
    // (2.5, 1.5, 1.5, 5.5) → median 2.0
    assert(eval("mad_over_time(m[40s])", start = 30L, end = 30L, step = 1L) ==
      Set(("m?job=a", 30L, 2.0)))
    // odd window (1,5,2) at t=20: median 2 → |dev| (1,3,0) → 1
    assert(eval("mad_over_time(m[30s])", start = 20L, end = 20L, step = 1L) ==
      Set(("m?job=a", 20L, 1.0)))
    // atan2 vector-scalar: name dropped, atan2(9, 1) at t=30
    assert(eval("m atan2 1", start = 30L, end = 30L, step = 1L) ==
      Set(("?job=a", 30L, math.atan2(9.0, 1.0))))
  }

  test("holt_winters matches the reference recurrence; date fns are UTC math") {
    val pts = matrix(
      ("m", 0L, 5.0), ("m", 10L, 3.0), ("m", 20L, 8.0),
      ("m", 30L, 1.0), ("m", 40L, 9.0))
      .withColumnRenamed("t", "time")
    val tags = graft.engine.GraphiteTables.expandTagRows(
      pts.select(org.apache.spark.sql.functions.col("path")).distinct()
        .withColumn("date", org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    // hand-folded funcHoltWinters(sf=0.5, tf=0.3) over 5,3,8,1,9
    val out = rowSet(PromQL.evalMatrix(
      pts, tags, PromQL.parse("holt_winters(m[50s], 0.5, 0.3)").toOption.get,
      40L, 40L, 1L))
    assert(out.size == 1 && math.abs(out.head._3 - 4.97125) < 1e-9)
    // date functions over the grid: epoch 0 was a Thursday (dow 4)
    def eval(q: String) = rowSet(PromQL.evalMatrix(
      pts, tags, PromQL.parse(q).toOption.get, 0L, 7200L, 3600L))
    assert(eval("hour()") == Set(("", 0L, 0.0), ("", 3600L, 1.0), ("", 7200L, 2.0)))
    assert(eval("day_of_week()") ==
      Set(("", 0L, 4.0), ("", 3600L, 4.0), ("", 7200L, 4.0)))
    assert(eval("minute()") == Set(("", 0L, 0.0), ("", 3600L, 0.0), ("", 7200L, 0.0)))
  }

  test("@ pins evaluation; limitk caps series per slot") {
    val pts = matrix(
      ("a", 0L, 1.0), ("a", 30L, 2.0), ("b", 0L, 5.0), ("c", 0L, 9.0),
      ("m?x=1", 0L, 1.0), ("m?x=2", 0L, 5.0), ("m?x=3", 0L, 9.0))
      .withColumnRenamed("t", "time")
    val tags = graft.engine.GraphiteTables.expandTagRows(
      pts.select(org.apache.spark.sql.functions.col("path")).distinct()
        .withColumn("date", org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    def eval(q: String) = rowSet(PromQL.evalMatrix(
      pts, tags, PromQL.parse(q).toOption.get, 0L, 60L, 30L, lookbackSec = 10L))
    // a @ 0 pins value 1.0 across all three slots (a's value at t=0)
    assert(eval("a @ 0") ==
      Set(("a", 0L, 1.0), ("a", 30L, 1.0), ("a", 60L, 1.0)))
    // @ start() / @ end(): pinned to the window edges
    assert(eval("a @ start()") == eval("a @ 0"))
    assert(eval("a @ 30") ==
      Set(("a", 0L, 2.0), ("a", 30L, 2.0), ("a", 60L, 2.0)))
    // limitk(2, …) keeps the 2 lowest paths per slot (staleness keeps
    // the t=0 samples alive only at slot 0 under the 10s lookback)
    assert(eval("limitk(2, m)") ==
      Set(("m?x=1", 0L, 1.0), ("m?x=2", 0L, 5.0)))
  }

  test("limit_ratio partitions the vector deterministically") {
    val pts = matrix(
      (0 until 20).map(i => (s"m?x=$i", 0L, i.toDouble)): _*)
      .withColumnRenamed("t", "time")
    val tags = graft.engine.GraphiteTables.expandTagRows(
      pts.select(org.apache.spark.sql.functions.col("path")).distinct()
        .withColumn("date", org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    def eval(q: String) = rowSet(PromQL.evalMatrix(
      pts, tags, PromQL.parse(q).toOption.get, 0L, 0L, 1L, lookbackSec = 10L))
    val all = eval("m")
    val kept = eval("limit_ratio(0.5, m)")
    val rest = eval("limit_ratio(-0.5, m)")
    // r and r-1 partition the vector exactly (upstream's contract)
    assert(kept.intersect(rest).isEmpty)
    assert(kept.union(rest) == all)
    // deterministic: same query, same membership
    assert(eval("limit_ratio(0.5, m)") == kept)
    assert(PromQL.parse("limit_ratio(1.5, m)").isLeft)
  }

  test("calendar date functions: grid form and vector-value form") {
    // 2024-02-29 00:00 UTC — leap day, a Thursday
    val leap = 1709164800L
    val pts = matrix(("m?x=1", leap, leap.toDouble))
      .withColumnRenamed("t", "time")
    val tags = graft.engine.GraphiteTables.expandTagRows(
      pts.select(org.apache.spark.sql.functions.col("path")).distinct()
        .withColumn("date", org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    def eval(q: String) = rowSet(PromQL.evalMatrix(
      pts, tags, PromQL.parse(q).toOption.get, leap, leap, 1L, lookbackSec = 10L))
    // no-arg: label-less grid series over the eval timestamp
    assert(eval("month()") == Set(("", leap, 2.0)))
    assert(eval("year()") == Set(("", leap, 2024.0)))
    assert(eval("day_of_month()") == Set(("", leap, 29.0)))
    assert(eval("day_of_year()") == Set(("", leap, 60.0)))
    assert(eval("days_in_month()") == Set(("", leap, 29.0)))
    assert(eval("day_of_week()") == Set(("", leap, 4.0)))
    // vector form: sample VALUES are the timestamps; name dropped
    assert(eval("month(m)") == Set(("?x=1", leap, 2.0)))
    assert(eval("days_in_month(m)") == Set(("?x=1", leap, 29.0)))
    // non-leap February
    val feb23 = 1676419200L // 2023-02-15 00:00 UTC
    val pts2 = matrix(("m?x=1", feb23, feb23.toDouble))
      .withColumnRenamed("t", "time")
    assert(rowSet(PromQL.evalMatrix(pts2, tags,
      PromQL.parse("days_in_month()").toOption.get,
      feb23, feb23, 1L, lookbackSec = 10L)) == Set(("", feb23, 28.0)))
    assert(PromQL.parse("month(1 + 2)").isLeft)
    assert(PromQL.parse("month(3)").isLeft)
  }

  test("xrate/xincrease reproduce upstream's boundary extrapolation") {
    val tags = graft.engine.GraphiteTables.expandTagRows(
      matrix(("m?x=1", 0L, 0.0))
        .select(org.apache.spark.sql.functions.col("path")).distinct()
        .withColumn("date", org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    def eval(q: String, pts: (String, Long, Double)*) = rowSet(PromQL.evalMatrix(
      matrix(pts: _*).withColumnRenamed("t", "time"), tags,
      PromQL.parse(q).toOption.get, 100L, 100L, 1L, lookbackSec = 10L))
    // 3 samples spanning [20,80] of a 100s window ending at t=100:
    // inc=30, sampled=60, avgDur=30, dStart=20 (zero-crossing = 20
    // does not shrink it), dEnd=20 → factor 100/60
    val pts = Seq(("m?x=1", 20L, 10.0), ("m?x=1", 40L, 20.0),
      ("m?x=1", 80L, 40.0))
    assert(eval("xincrease(m[100s])", pts: _*) ==
      Set(("m?x=1", 100L, 30.0 * (100.0 / 60.0))))
    assert(eval("xrate(m[100s])", pts: _*) ==
      Set(("m?x=1", 100L, 30.0 * (100.0 / 60.0) / 100.0)))
    // sparse early pair: dStart clamps at the zero crossing (0), the
    // long tail gap clamps at avgDur/2 → factor (5+0+2.5)/5 = 1.5
    assert(eval("xincrease(m[100s])", ("m?x=1", 5L, 0.0), ("m?x=1", 10L, 10.0)) ==
      Set(("m?x=1", 100L, 15.0)))
    // plain increase now defaults to the same upstream extrapolation
    assert(eval("increase(m[100s])", pts: _*) ==
      Set(("m?x=1", 100L, 30.0 * (100.0 / 60.0))))
    // clamp/cap ORDER (upstream post-2.52): dStart0=30 ≥ thresh=11 →
    // capped to avgDur/2=5 FIRST; zero crossing durToZero=30·4/15=8
    // is checked against the CAPPED 5 (8 not < 5 → stays 5), NOT
    // against the raw 30 (which would yield 8 → increase 21.5)
    val pts2 = Seq(("m?x=1", 30L, 4.0), ("m?x=1", 40L, 9.0),
      ("m?x=1", 50L, 14.0), ("m?x=1", 60L, 19.0))
    assert(eval("increase(m[100s])", pts2: _*) ==
      Set(("m?x=1", 100L, 20.0))) // 15·(30+5+5)/30
  }

  test("sort_by_label orders the instant assembly, eval is identity") {
    assert(PromQL.parse("""sort_by_label(m, "a", "b")""") ==
      Right(PromQL.SortByLabel(desc = false,
        Seq("a", "b"), PromQL.Selector(Seq(("__name__", "=", "m"))))))
    assert(PromQL.parse("""sort_by_label_desc(m, "a")""").toOption.get
      .asInstanceOf[PromQL.SortByLabel].desc)
    assert(PromQL.parse("sort_by_label(m)").isLeft)
    val rows = Seq(("m?a=2&b=x", 0L, 1.0), ("m?a=1&b=y", 0L, 2.0),
      ("m?b=z", 0L, 3.0))
    val asc = PromQL.orderInstant(
      PromQL.parse("""sort_by_label(m, "a")""").toOption.get, rows).get
    // missing label sorts first; then by label value
    assert(asc.map(_._1) == Seq("m?b=z", "m?a=1&b=y", "m?a=2&b=x"))
    val desc = PromQL.orderInstant(
      PromQL.parse("""sort_by_label_desc(m, "a")""").toOption.get, rows).get
    assert(desc.map(_._1) == asc.map(_._1).reverse)
    // equal label values: the path tiebreak stays ASCENDING under desc
    val tied = Seq(("m?a=1&b=y", 0L, 1.0), ("m?a=1&b=x", 0L, 2.0))
    assert(PromQL.orderInstant(
      PromQL.parse("""sort_by_label_desc(m, "a")""").toOption.get, tied)
      .get.map(_._1) == Seq("m?a=1&b=x", "m?a=1&b=y"))
    // value sort still routes through the same helper
    assert(PromQL.orderInstant(
      PromQL.parse("sort_desc(m)").toOption.get, rows).get.map(_._3) ==
      Seq(3.0, 2.0, 1.0))
    assert(PromQL.orderInstant(
      PromQL.parse("m").toOption.get, rows).isEmpty)
  }

  test("grouped topk ranks within each label group per slot") {
    val pts = matrix(
      ("m?g=a&x=1", 0L, 1.0), ("m?g=a&x=2", 0L, 5.0),
      ("m?g=b&x=3", 0L, 2.0), ("m?g=b&x=4", 0L, 9.0))
      .withColumnRenamed("t", "time")
    val tags = graft.engine.GraphiteTables.expandTagRows(
      pts.select(org.apache.spark.sql.functions.col("path")).distinct()
        .withColumn("date", org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    def eval(q: String) = rowSet(PromQL.evalMatrix(
      pts, tags, PromQL.parse(q).toOption.get, 0L, 0L, 1L, lookbackSec = 10L))
    // plain topk: global best
    assert(eval("topk(1, m)") == Set(("m?g=b&x=4", 0L, 9.0)))
    // by (g): the best per group, full labels kept
    assert(eval("topk by (g) (1, m)") ==
      Set(("m?g=a&x=2", 0L, 5.0), ("m?g=b&x=4", 0L, 9.0)))
    // without (x): same grouping through the complement
    assert(eval("bottomk without (x) (1, m)") ==
      Set(("m?g=a&x=1", 0L, 1.0), ("m?g=b&x=3", 0L, 2.0)))
  }

  test("absent: 1 where the inner vector is empty, labels from eq matchers") {
    val pts = matrix(("m?job=a", 0L, 1.0)).withColumnRenamed("t", "time")
    val tags = graft.engine.GraphiteTables.expandTagRows(
      pts.select(org.apache.spark.sql.functions.col("path")).distinct()
        .withColumn("date", org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    // matching series present at every slot → absent is empty
    assert(rowSet(PromQL.evalMatrix(
      pts, tags, PromQL.parse("""absent(m{job="a"})""").toOption.get,
      0L, 60L, 30L, lookbackSec = 300L)).isEmpty)
    // nothing matches → 1 at every slot, labels from the matchers
    assert(rowSet(PromQL.evalMatrix(
      pts, tags, PromQL.parse("""absent(nope{job="a"})""").toOption.get,
      0L, 60L, 30L, lookbackSec = 300L)) ==
      Set(("?job=a", 0L, 1.0), ("?job=a", 30L, 1.0), ("?job=a", 60L, 1.0)))
  }

  test("histogram_quantile interpolates within sorted le buckets") {
    val lm = matrix(
      ("h?job=a&le=0.1", 0L, 1.0),
      ("h?job=a&le=0.5", 0L, 3.0),
      ("h?job=a&le=+Inf", 0L, 4.0))
    // rank = 0.5*4 = 2 → bucket (0.1, 0.5], interp 0.1 + 0.4*(2-1)/(3-1)
    val out = rowSet(PromQL.histogramQuantileMatrix(lm, 0.5))
    assert(out.map(_._1) == Set("?job=a"))
    assert(math.abs(out.head._3 - 0.3) < 1e-12)
    // φ = 1 lands in +Inf → highest finite bound
    assert(rowSet(PromQL.histogramQuantileMatrix(lm, 1.0)) ==
      Set(("?job=a", 0L, 0.5)))
    // φ outside [0,1] → ±Inf
    assert(rowSet(PromQL.histogramQuantileMatrix(lm, 1.5)) ==
      Set(("?job=a", 0L, Double.PositiveInfinity)))
    assert(rowSet(PromQL.histogramQuantileMatrix(lm, -0.5)) ==
      Set(("?job=a", 0L, Double.NegativeInfinity)))
    // no +Inf bucket → NaN
    val noInf = matrix(("h?job=a&le=0.1", 0L, 1.0), ("h?job=a&le=0.5", 0L, 3.0))
    assert(rowSet(PromQL.histogramQuantileMatrix(noInf, 0.5)).head._3.isNaN)
    // first bucket with le <= 0 resolves to its own bound
    val negFirst = matrix(
      ("h?job=a&le=-1", 0L, 5.0),
      ("h?job=a&le=1", 0L, 8.0),
      ("h?job=a&le=+Inf", 0L, 10.0))
    assert(rowSet(PromQL.histogramQuantileMatrix(negFirst, 0.3)) ==
      Set(("?job=a", 0L, -1.0)))
    // full-parse e2e: histogram_quantile over a selector, per group
    val expr = PromQL.parse("histogram_quantile(0.5, h)").toOption.get
    val pts = matrix(
      ("h?job=a&le=0.1", 0L, 1.0), ("h?job=a&le=0.5", 0L, 3.0),
      ("h?job=a&le=+Inf", 0L, 4.0),
      ("h?job=b&le=0.1", 0L, 4.0), ("h?job=b&le=+Inf", 0L, 4.0))
      .withColumnRenamed("t", "time")
    val tags = graft.engine.GraphiteTables.expandTagRows(
      pts.select(org.apache.spark.sql.functions.col("path"))
        .distinct()
        .withColumn("date", org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    val out2 = rowSet(PromQL.evalMatrix(pts, tags, expr, 0L, 0L, 1L, lookbackSec = 300L))
    assert(out2.exists(r => r._1 == "?job=a" && math.abs(r._3 - 0.3) < 1e-12))
    // job=b: rank 2 falls in the first bucket (cnt 4 ≥ 2, le 0.1 > 0)
    // → interpolate from 0: 0 + 0.1*(2-0)/(4-0) = 0.05
    assert(out2.exists(r => r._1 == "?job=b" && math.abs(r._3 - 0.05) < 1e-12))
  }

  test("histogram_quantile repairs non-monotonic cumulative buckets like upstream") {
    // post-rate float jitter: the 0.5 bucket dips below its
    // predecessor; ensureMonotonic clamps counts to the running max
    // → (2.2, 2.2, 4, 4)
    val jitter = matrix(
      ("h?job=a&le=0.1", 0L, 2.2),
      ("h?job=a&le=0.5", 0L, 1.9),
      ("h?job=a&le=1", 0L, 4.0),
      ("h?job=a&le=+Inf", 0L, 4.0))
    // rank = 0.5·4 = 2 lands in the FIRST bucket after repair →
    // interpolate from 0: 0.1·2/2.2 — upstream bucketQuantile's output
    // on the same vector. Without the repair the rank search would
    // land in the dipped bucket and extrapolate 0.3667 instead.
    val out = rowSet(PromQL.histogramQuantileMatrix(jitter, 0.5))
    assert(out.map(_._1) == Set("?job=a"))
    assert(math.abs(out.head._3 - 0.1 * 2.0 / 2.2) < 1e-12, out.toString)
    // a rank past the dip interpolates on repaired counts too:
    // φ=0.9 → rank 3.6 → bucket (0.5, 1]
    val out9 = rowSet(PromQL.histogramQuantileMatrix(jitter, 0.9))
    assert(math.abs(
      out9.head._3 - (0.5 + 0.5 * (0.9 * 4.0 - 2.2) / (4.0 - 2.2))) < 1e-12,
      out9.toString)
  }

  test("fused agg binop ≡ generic two-pipeline evaluation") {
    // three series: m{job=a,inst=1}, m{job=a,inst=2}, m{job=b,inst=1};
    // job=b has a slot the filtered left side lacks entirely
    val pts = matrix(
      ("m?inst=1&job=a", 0L, 1.0), ("m?inst=1&job=a", 10L, 3.0),
      ("m?inst=2&job=a", 0L, 2.0),
      ("m?inst=1&job=b", 0L, 4.0), ("m?inst=1&job=b", 10L, 6.0))
      .withColumnRenamed("t", "time")
    val tags = graft.engine.GraphiteTables.expandTagRows(
      pts.select(org.apache.spark.sql.functions.col("path"))
        .distinct()
        .withColumn("date",
          org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
        .withColumn("version", org.apache.spark.sql.functions.lit(0L)))
    def eval(q: String): Set[(String, Long, Double)] = rowSet(PromQL.evalMatrix(
      pts, tags, PromQL.parse(q).toOption.get, 0L, 10L, 10L, lookbackSec = 15L))
    def generic(ql: String, qr: String, op: String): Set[(String, Long, Double)] =
      rowSet(PromQL.binOpMatrix(
        PromQL.evalMatrix(pts, tags, PromQL.parse(ql).toOption.get,
          0L, 10L, 10L, lookbackSec = 15L),
        PromQL.evalMatrix(pts, tags, PromQL.parse(qr).toOption.get,
          0L, 10L, 10L, lookbackSec = 15L),
        op))
    // overlapping-but-different sides, same grouping → fuses
    val q1 = ("""sum by (job) (m{inst="1"})""", """sum by (job) (m)""")
    assert(eval(s"${q1._1} / ${q1._2}") == generic(q1._1, q1._2, "/"))
    // mixed aggregation ops on the two sides
    val q2 = ("""avg by (job) (m{inst="1"})""", """count by (job) (m)""")
    assert(eval(s"${q2._1} * ${q2._2}") == generic(q2._1, q2._2, "*"))
    // empty grouping key (sum by ()): single nameless group
    val q3 = ("""sum(m{job="a"})""", """sum(m)""")
    assert(eval(s"${q3._1} - ${q3._2}") == generic(q3._1, q3._2, "-"))
    // a group present on ONE side only must vanish (inner-join gate):
    // left selector matches nothing under job=b at slot 0 and 10
    val only = eval("""sum by (job) (m{inst="2"}) / sum by (job) (m)""")
    assert(only.map(_._1) == Set("?job=a"), only.toString)
  }
}
