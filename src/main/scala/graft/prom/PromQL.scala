package graft.prom

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PromQL subset for `/api/v1/query_range` and `/api/v1/query` —
  * what a Grafana dashboard / alert-rule workload hits over the
  * Graphite-tagged storage: instant vector selectors,
  * `rate`/`increase`/`*_over_time` over a range selector,
  * `sum`/`avg`/`min`/`max`/`count`/`stddev`/`stdvar`/`group`/
  * `quantile(φ, …)` aggregation with `by (label, …)` grouping,
  * `topk`/`bottomk`, `histogram_quantile` with `le`-bucket
  * interpolation, parenthesized nesting, and space-separated binary
  * operators: arithmetic (`+ - * / % ^`), comparisons (filter mode,
  * or 0/1 with `bool`), and the set operators `and`/`or`/`unless` —
  * all with `on(…)`/`ignoring(…)` match keys and
  * `group_left(…)`/`group_right(…)` many-to-one matching. The
  * reference serves full PromQL by importing the stock upstream
  * engine (`prometheus/run.go:28-83`); this evaluator covers the
  * subset natively — and distributed — instead, on the same
  * matcher→tagged-term seam (`prometheus/querier_select.go:95-147`).
  *
  * Declared divergence: `rate`/`increase` use the classic
  * first-to-last-sample form with counter-reset correction, WITHOUT
  * Prometheus's boundary extrapolation (extrapolatedRate) — documented
  * here because the value at window edges can differ by a fraction of
  * one scrape interval.
  *
  * Evaluation is one distributed pass, scale-shaped for wide fleets:
  * each sample is exploded onto the [t₀+n·step] eval slots it can
  * serve (bounded by window/step slots per sample), then ONE hash
  * aggregate per (series, slot) computes the vector — no range join,
  * no per-series driver loop, no full-window sort except inside
  * `rate`'s bounded per-slot sample list.
  */
object PromQL {

  /** Prometheus's default instant-vector staleness lookback (5 m). */
  val LookbackSec: Long = 300L

  sealed trait Expr { def matchers: Seq[(String, String, String)] }

  /** `metric{k="v"}` — instant vector, evaluated per grid point as
    * the most recent sample within the lookback window.
    */
  final case class Selector(matchers: Seq[(String, String, String)]) extends Expr

  /** `fn(metric{…}[range])` for fn ∈ rate | increase | avg_over_time |
    * sum_over_time | min_over_time | max_over_time | count_over_time |
    * last_over_time.
    */
  final case class RangeFn(
      fn: String,
      sel: Selector,
      rangeSec: Long) extends Expr {
    def matchers: Seq[(String, String, String)] = sel.matchers
  }

  /** `op by (l1, l2) (inner)` for op ∈ sum | avg | min | max | count |
    * stddev | stdvar | group —
    * Prometheus aggregation over the instant vector: one extra hash
    * aggregate per grid slot on the label subset (empty `by` collapses
    * to a single series). Output series keep only the `by` labels,
    * encoded back into the storage path form (`?k=v&…`, no name) so
    * the response assembly stays uniform. `by (__name__)` is not
    * supported (the name is not a query-string label in storage form).
    */
  final case class Agg(op: String, by: Seq[String], inner: Expr) extends Expr {
    def matchers: Seq[(String, String, String)] = inner.matchers
  }

  /** `topk(k, inner)` / `bottomk(k, inner)` — per grid point, the k
    * series with the largest (smallest) value. Unlike [[Agg]] the
    * output series keep their full label sets; ties break on the
    * storage path for deterministic output (Prometheus leaves tie
    * order unspecified).
    */
  final case class RankK(op: String, k: Int, inner: Expr) extends Expr {
    def matchers: Seq[(String, String, String)] = inner.matchers
  }

  /** `quantile(φ, inner)` / `quantile by (labels) (φ, inner)` — the
    * φ-quantile (linear interpolation across series values, like
    * Prometheus) per grid point and `by`-group.
    */
  final case class Quantile(phi: Double, by: Seq[String], inner: Expr) extends Expr {
    def matchers: Seq[(String, String, String)] = inner.matchers
  }

  /** Vector-matching modifiers on a binary/set operator:
    * `on(labels)` (`on = true`) keys the match on exactly `labels`;
    * `ignoring(labels)` (`on = false`, labels non-empty) on everything
    * but them; the default (`on = false`, empty labels) on the full
    * label set sans `__name__`. `side` 1/2 = `group_left`/`group_right`
    * many-to-one matching, with `include` the labels copied over from
    * the "one" side onto the result (`group_left(instance)`).
    */
  final case class Matching(
      on: Boolean,
      labels: Seq[String],
      side: Int,
      include: Seq[String])
  object Matching {
    val OneToOne = 0; val GroupLeft = 1; val GroupRight = 2
    val default: Matching = Matching(on = false, Nil, OneToOne, Nil)
  }

  /** `lhs op rhs` for op ∈ + - * / % ^ and comparisons — vector
    * arithmetic with Prometheus's one-to-one matching on the match key
    * from [[Matching]] (default: full label set ignoring `__name__`;
    * the name is dropped from the result, as Prometheus does), or
    * many-to-one with `group_left`/`group_right`. Comparisons filter
    * (keeping the left row untouched) unless `boolMode` turns them
    * into 0/1-valued vectors. Declared divergence: if several series
    * on the "one" side of a match share a key, Prometheus hard-errors;
    * this evaluator deterministically keeps the max-(value, path)
    * entry (and for default one-to-one arithmetic degenerates to
    * many-to-many).
    */
  final case class BinOp(
      op: String,
      lhs: Expr,
      rhs: Expr,
      boolMode: Boolean = false,
      matching: Matching = Matching.default) extends Expr {
    def matchers: Seq[(String, String, String)] = lhs.matchers
  }

  /** `lhs and|or|unless rhs` — Prometheus set operators over instant
    * vectors, keyed per grid slot on the [[Matching]] key: `and` keeps
    * left rows whose key exists on the right (semi-join), `unless`
    * those whose key doesn't (anti-join), `or` all left rows plus the
    * right rows whose key has no left entry in that slot. Series keep
    * their full label sets and names, like Prometheus.
    */
  final case class SetOp(
      op: String,
      lhs: Expr,
      rhs: Expr,
      matching: Matching = Matching.default) extends Expr {
    def matchers: Seq[(String, String, String)] = lhs.matchers
  }

  /** `histogram_quantile(φ, inner)` — the classic-histogram quantile:
    * group the inner matrix by (labels minus `le`, slot), sort the
    * cumulative buckets by their upper bound, and linearly interpolate
    * within the bucket the φ-rank falls into, exactly Prometheus's
    * `bucketQuantile` (`promql/quantile.go`) including its edge cases
    * (±Inf for φ outside [0,1], NaN without a +Inf bucket or with < 2
    * buckets, highest finite bound when the rank lands in +Inf, lower
    * bound clamp for a first bucket with `le ≤ 0`). Divergence: no
    * monotonicity repair pass — bucket counts that genuinely decrease
    * (float jitter after `rate`) are used as-is.
    */
  final case class HistQuantile(phi: Double, inner: Expr) extends Expr {
    def matchers: Seq[(String, String, String)] = inner.matchers
  }

  /** A numeric literal operand (`m * 60`, `m / 100`). */
  final case class Scalar(v: Double) extends Expr {
    def matchers: Seq[(String, String, String)] = Seq.empty
  }

  /** `sel offset 1h` / `rate(m[5m] offset 1h)` — evaluate the inner
    * selector shifted `offsetSec` into the past (the week-over-week
    * dashboard modifier). Evaluation is the same plan on a shifted
    * window with the grid stamps shifted back — no extra pass.
    */
  final case class Offset(offsetSec: Long, inner: Expr) extends Expr {
    def matchers: Seq[(String, String, String)] = inner.matchers
  }

  val rangeFns: Set[String] = Set(
    "rate", "increase", "avg_over_time", "sum_over_time", "min_over_time",
    "max_over_time", "count_over_time", "last_over_time")

  val aggOps: Set[String] = Set(
    "sum", "avg", "min", "max", "count", "stddev", "stdvar", "group")

  val setOps: Set[String] = Set("and", "or", "unless")

  /** `"5m"`/`"90s"`/`"1h"` (single unit, like the common UI forms) →
    * seconds.
    */
  def durationSec(s: String): Either[String, Long] = {
    val m = "^([0-9]+)(ms|s|m|h|d|w|y)$".r
    s.trim match {
      case m(n, unit) =>
        val mult = unit match {
          case "ms" => return Right(math.max(1L, n.toLong / 1000))
          case "s" => 1L; case "m" => 60L; case "h" => 3600L
          case "d" => 86400L; case "w" => 604800L; case "y" => 31536000L
        }
        Right(n.toLong * mult)
      case other => Left(s"bad duration: '$other'")
    }
  }

  /** Parse the subset: `op by (labels) (expr)` / `op(expr) by (labels)`
    * aggregations over `fn(selector[dur])` or a bare selector.
    */
  def parse(q0: String): Either[String, Expr] = {
    val q = q0.trim
    val ops = "sum|avg|min|max|count|stddev|stdvar|group"
    val aggPre = ("^(" + ops + ")\\s*by\\s*\\(([^()]*)\\)\\s*\\((.*)\\)$").r
    val aggSuf = ("^(" + ops + ")\\s*\\((.*)\\)\\s*by\\s*\\(([^()]*)\\)$").r
    val aggBare = ("^(" + ops + ")\\s*\\((.*)\\)$").r
    val quantPre = "^quantile\\s*by\\s*\\(([^()]*)\\)\\s*\\(\\s*([0-9.]+)\\s*,(.*)\\)$".r
    val quantBare = "^quantile\\s*\\(\\s*([0-9.]+)\\s*,(.*)\\)$".r
    def agg(op: String, by: String, inner: String): Either[String, Expr] = {
      val labels = by.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      if (labels.contains("__name__")) Left("by (__name__) is not supported")
      else parse(inner).map(Agg(op, labels, _))
    }
    val rankK = "^(topk|bottomk)\\s*\\(\\s*(\\d+)\\s*,(.*)\\)$".r
    val histQ = "^histogram_quantile\\s*\\(\\s*(-?[0-9.]+)\\s*,(.*)\\)$".r
    val fnMatch = "^([a-z_]+)\\((.*)\\)$".r
    // binary operators split at paren/brace/bracket/quote depth 0 —
    // loosest Prometheus tier first: or, then and/unless, then
    // comparisons, then +/-, then */%/^ (last occurrence each for
    // left-associativity). The right side may lead with `bool` /
    // `on` / `ignoring` / `group_left` / `group_right` modifiers.
    splitBinOp(q) match {
      case Some((op, l, r0)) =>
        return for {
          mods <- stripModifiers(op, r0)
          (bool, m, r) = mods
          le <- parse(l)
          re <- parse(r)
          _ <- (le, re) match {
            case (Scalar(_), _) | (_, Scalar(_))
                if setOps(op) || m != Matching.default =>
              Left(s"vector matching modifiers and set operators need vector operands: '$q0'")
            case _ => Right(())
          }
        } yield
          if (setOps(op)) SetOp(op, le, re, m) else BinOp(op, le, re, bool, m)
      case None =>
    }
    // a fully parenthesized group: `(a + b)` after `/ c` was split off
    parenWrapped(q) match {
      case Some(inner) => return parse(inner)
      case None =>
    }
    q match {
      case histQ(phis, inner) =>
        phis.toDoubleOption match {
          // φ outside [0,1] is legal and yields ±Inf, like Prometheus
          case Some(p) => parse(inner).map(HistQuantile(p, _))
          case None    => Left(s"histogram_quantile: bad phi '$phis'")
        }
      case rankK(op, ks, inner) =>
        ks.toIntOption.filter(_ >= 1) match {
          case Some(k) => parse(inner).map(RankK(op, k, _))
          case None    => Left(s"$op: bad k '$ks'")
        }
      case aggPre(op, by, inner)  => agg(op, by, inner)
      case aggSuf(op, inner, by)  => agg(op, by, inner)
      case aggBare(op, inner) => agg(op, "", inner)
      case quantPre(by, phi, inner) =>
        val labels = by.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        phi.toDoubleOption.filter(p => p >= 0.0 && p <= 1.0) match {
          case _ if labels.contains("__name__") => Left("by (__name__) is not supported")
          case Some(p) => parse(inner).map(Quantile(p, labels, _))
          case None    => Left(s"quantile: bad phi '$phi'")
        }
      case quantBare(phi, inner) =>
        phi.toDoubleOption.filter(p => p >= 0.0 && p <= 1.0) match {
          case Some(p) => parse(inner).map(Quantile(p, Nil, _))
          case None    => Left(s"quantile: bad phi '$phi'")
        }
      case fnMatch(fn, inner1) =>
        if (!rangeFns(fn)) return Left(s"unsupported function: $fn")
        val (inner, off) = stripOffset(inner1.trim)
        if (!inner.endsWith("]")) return Left(s"$fn expects a range selector, got '$inner'")
        val brk = inner.lastIndexOf('[')
        if (brk < 0) return Left(s"$fn expects a range selector, got '$inner'")
        val parsed: Either[String, Expr] = for {
          d <- durationSec(inner.substring(brk + 1, inner.length - 1))
          sel <- Prom.parseSelector(inner.substring(0, brk))
        } yield RangeFn(fn, Selector(sel), d)
        off.fold(parsed)(o => parsed.flatMap(e => o.map(Offset(_, e))))
      case _ =>
        val (base, off) = stripOffset(q)
        val parsed: Either[String, Expr] = base.toDoubleOption match {
          case Some(v) => Right(Scalar(v))
          // parens/whitespace in the metric-name part mean an
          // expression failed to match above, not a selector —
          // `(m) (n)` must not become a metric literally named that
          case None if base.takeWhile(_ != '{').exists(c =>
              c == '(' || c == ')' || c.isWhitespace) =>
            Left(s"not a valid expression: '$q0'")
          case None => Prom.parseSelector(base).map(Selector(_))
        }
        off.fold(parsed) {
          o => parsed.flatMap {
            case s: Selector => o.map(Offset(_, s))
            case _ => Left("offset only applies to selectors")
          }
        }
    }
  }

  /** Split a trailing ` offset <dur>` modifier off an expression
    * string. Returns (rest, None) when absent, or (rest,
    * Some(parsed duration)).
    */
  private def stripOffset(s: String): (String, Option[Either[String, Long]]) = {
    val offRe = "^(.*\\S)\\s+offset\\s+(\\S+)$".r
    s match {
      case offRe(rest, dur) => (rest.trim, Some(durationSec(dur)))
      case _ => (s, None)
    }
  }

  /** `(expr)` spanning the whole string (the closing paren of the
    * leading `(` is the LAST character) → the inner expression.
    */
  private def parenWrapped(q: String): Option[String] = {
    if (q.length < 2 || q.charAt(0) != '(' || q.charAt(q.length - 1) != ')')
      return None
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (inQuote) {
        if (c == '\\' && i + 1 < q.length) i += 1
        else if (c == '"') inQuote = false
      } else c match {
        case '"' => inQuote = true
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' =>
          depth -= 1
          // the opening paren closes before the end → not a wrapper
          if (depth == 0 && i < q.length - 1) return None
        case _ =>
      }
      i += 1
    }
    if (depth == 0) Some(q.substring(1, q.length - 1).trim) else None
  }

  private val boolRe = "^bool(?![a-zA-Z0-9_])\\s*(.*)$".r
  private val onRe = "^(on|ignoring)\\s*\\(([^()]*)\\)\\s*(.*)$".r
  private val grpRe = "^(group_left|group_right)(?:\\s*\\(([^()]*)\\))?(?![a-zA-Z0-9_])\\s*(.*)$".r

  /** Strip the optional `bool` / `on(…)`|`ignoring(…)` /
    * `group_left(…)`|`group_right(…)` modifier prefix (that grammar
    * order, like Prometheus) off the right-hand side of a split binary
    * operator. Returns (boolMode, matching, remaining rhs).
    */
  private def stripModifiers(
      op: String, rhs0: String): Either[String, (Boolean, Matching, String)] = {
    var rest = rhs0.trim
    var bool = false
    rest match {
      case boolRe(r) =>
        if (!cmpOps(op)) return Left(s"bool modifier only applies to comparisons, not '$op'")
        bool = true; rest = r
      case _ =>
    }
    var on = false
    var labels: Seq[String] = Nil
    var onSeen = false
    rest match {
      case onRe(kind, ls, r) =>
        on = kind == "on"
        labels = ls.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        onSeen = true; rest = r
      case _ =>
    }
    var side = Matching.OneToOne
    var include: Seq[String] = Nil
    rest match {
      case grpRe(kind, ls, r) =>
        if (setOps(op)) return Left(s"no grouping allowed for set operator '$op'")
        if (!onSeen) return Left(s"$kind requires an on/ignoring clause")
        side = if (kind == "group_left") Matching.GroupLeft else Matching.GroupRight
        include = Option(ls).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        rest = r
      case _ =>
    }
    if (rest.isEmpty) Left(s"missing right operand after modifiers in '$rhs0'")
    else Right((bool, Matching(on, labels, side, include), rest))
  }

  /** Find the top-level binary operator to split at, loosest
    * precedence first (Prometheus order): the LAST depth-0 spaced
    * `or`, else `and`/`unless`, else a comparison (`== != > < >= <=`),
    * else `+`/`-`, else `*`/`/`/`%` — last occurrence each for
    * left-associativity — else the FIRST `^` (right-assoc). The
    * operator must be space-separated — graphite metric names may
    * legally contain `-`/`.`, so `my-metric` stays a selector while
    * `a - b` is arithmetic. Returns (op, lhs, rhs).
    */
  private def splitBinOp(q: String): Option[(String, String, String)] = {
    val n = q.length
    val depth0 = new Array[Boolean](n)
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < n) {
      val c = q.charAt(i)
      if (inQuote) {
        depth0(i) = false
        if (c == '\\' && i + 1 < n) { i += 1; depth0(i) = false }
        else if (c == '"') inQuote = false
      } else {
        c match {
          case '"' => inQuote = true
          case '(' | '[' | '{' => depth += 1
          case ')' | ']' | '}' => depth -= 1
          case _ =>
        }
        depth0(i) = depth == 0 && !inQuote
      }
      i += 1
    }
    // last depth-0 occurrence of any ` op ` from the tier
    def lastSpaced(ops: Seq[String]): Option[(Int, String)] =
      ops.flatMap { op =>
        val needle = " " + op + " "
        Iterator.iterate(q.lastIndexOf(needle))(at => q.lastIndexOf(needle, at - 1))
          .takeWhile(_ >= 0)
          .find(at => (at + 1 until at + 1 + op.length).forall(depth0))
          .map(at => (at + 1, op))
      }.sortBy(-_._1).headOption
    // first depth-0 occurrence, for the right-associative tier
    def firstSpaced(ops: Seq[String]): Option[(Int, String)] =
      ops.flatMap { op =>
        val needle = " " + op + " "
        Iterator.iterate(q.indexOf(needle))(at => q.indexOf(needle, at + 1))
          .takeWhile(_ >= 0)
          .find(at => (at + 1 until at + 1 + op.length).forall(depth0))
          .map(at => (at + 1, op))
      }.sortBy(_._1).headOption
    lastSpaced(Seq("or"))
      .orElse(lastSpaced(Seq("and", "unless")))
      .orElse(lastSpaced(Seq("==", "!=", ">=", "<=", ">", "<")))
      .orElse(lastSpaced(Seq("+", "-")))
      .orElse(lastSpaced(Seq("*", "/", "%")))
      .orElse(firstSpaced(Seq("^")))
      .map { case (at, op) =>
        (op, q.substring(0, at).trim, q.substring(at + op.length).trim)
      }
      .filter { case (_, l, r) => l.nonEmpty && r.nonEmpty }
  }

  /** Evaluate `expr` on the grid `start, start+step, …, ≤ end`.
    * Returns (path, t, value) matrix rows; `tags` is the tagged-series
    * relation the matchers select paths from, `points` the raw
    * (path, time, value) samples.
    */
  def evalMatrix(
      points: DataFrame,
      tags: DataFrame,
      expr: Expr,
      start: Long,
      end: Long,
      step0: Long,
      lookbackSec: Long = LookbackSec): DataFrame = {
    require(end >= start, "end < start")
    expr match {
      case Agg(op, by, inner) =>
        return aggMatrix(
          evalMatrix(points, tags, inner, start, end, step0, lookbackSec), op, by)
      case RankK(op, k, inner) =>
        return rankMatrix(
          evalMatrix(points, tags, inner, start, end, step0, lookbackSec), op, k)
      case Quantile(phi, by, inner) =>
        return aggMatrix(
          evalMatrix(points, tags, inner, start, end, step0, lookbackSec),
          "quantile", by, phi)
      case BinOp(op, l, r, bool, m) =>
        return (l, r) match {
          case (Scalar(_), Scalar(_)) =>
            throw new IllegalArgumentException("scalar-only expressions are not supported")
          case (Scalar(a), e) =>
            scalarOpMatrix(
              evalMatrix(points, tags, e, start, end, step0, lookbackSec),
              op, a, scalarLeft = true, boolMode = bool)
          case (e, Scalar(b)) =>
            scalarOpMatrix(
              evalMatrix(points, tags, e, start, end, step0, lookbackSec),
              op, b, scalarLeft = false, boolMode = bool)
          case _ =>
            binOpMatrix(
              evalMatrix(points, tags, l, start, end, step0, lookbackSec),
              evalMatrix(points, tags, r, start, end, step0, lookbackSec),
              op, bool, m)
        }
      case SetOp(op, l, r, m) =>
        return setOpMatrix(
          evalMatrix(points, tags, l, start, end, step0, lookbackSec),
          evalMatrix(points, tags, r, start, end, step0, lookbackSec), op, m)
      case HistQuantile(phi, inner) =>
        return histogramQuantileMatrix(
          evalMatrix(points, tags, inner, start, end, step0, lookbackSec), phi)
      case Scalar(_) =>
        throw new IllegalArgumentException("scalar-only expressions are not supported")
      case Offset(o, inner) =>
        // same plan over the shifted window, stamps shifted back
        return evalMatrix(points, tags, inner, start - o, end - o, step0, lookbackSec)
          .select(col("path"), (col("t") + lit(o)).as("t"), col("value"))
      case _ =>
    }
    val step = math.max(1L, step0)
    val lastSlot = (end - start) / step

    val win = expr match {
      case _: Selector      => lookbackSec
      case RangeFn(_, _, d) => d
      case _: Agg | _: RankK | _: Quantile | _: BinOp | _: SetOp | _: HistQuantile | _: Scalar | _: Offset =>
        throw new IllegalStateException("handled above")
    }

    // the matched series set is find-result-sized — broadcast it so
    // the sample scan needs no shuffle for the semi-join
    val paths = Prom.findByMatchers(tags, expr.matchers)
    val scanned = points
      .join(broadcast(paths), Seq("path"), "left_semi")
      .where(col("time") > lit(start - win) && col("time") <= lit(end))
    // duplicate write versions resolve max-version-wins before any
    // window math, like the render path's Uniq dedup
    // (`helper/point/func.go:29-51`)
    val pts =
      if (scanned.columns.contains("version"))
        scanned.groupBy("path", "time")
          .agg(max_by(col("value"), col("version")).as("value"))
      else scanned.select("path", "time", "value")

    // slot range a sample at time s can serve: t = start + n·step with
    // s ≤ t  and  t < s + win  (Prometheus takes samples from
    // (t-win, t]). Integer bounds, clamped to the grid; `sequence`
    // would count DOWN for empty ranges, so filter first.
    val offs = col("time") - lit(start)
    val nMin = greatest(lit(0L), floor((offs + lit(step - 1)) / lit(step)).cast("long"))
    val nMax = least(lit(lastSlot), floor((offs + lit(win - 1)) / lit(step)).cast("long"))
    val slotted = pts
      .withColumn("n_min", nMin).withColumn("n_max", nMax)
      .where(col("n_min") <= col("n_max"))
      .select(col("path"), col("time"), col("value"),
        explode(sequence(col("n_min"), col("n_max"))).as("n"))

    val t = (lit(start) + col("n") * lit(step)).as("t")
    expr match {
      case _: Selector =>
        // most recent sample in the window — one hash aggregate
        slotted.groupBy(col("path"), col("n"))
          .agg(max_by(col("value"), col("time")).as("value"))
          .select(col("path"), t, col("value"))

      case RangeFn(fn, _, _) =>
        val g = slotted.groupBy(col("path"), col("n"))
        val out = fn match {
          case "avg_over_time"   => g.agg(avg("value").as("value"))
          case "sum_over_time"   => g.agg(sum("value").as("value"))
          case "min_over_time"   => g.agg(min("value").as("value"))
          case "max_over_time"   => g.agg(max("value").as("value"))
          case "count_over_time" => g.agg(count(lit(1)).cast("double").as("value"))
          case "last_over_time"  => g.agg(max_by(col("value"), col("time")).as("value"))
          case "rate" | "increase" =>
            // per-slot sample list is bounded by window/scrape-interval
            // — sorting it is cheap and stays inside the aggregate
            val sorted = array_sort(collect_list(struct(col("time"), col("value"))))
            g.agg(sorted.as("s"), count(lit(1)).as("cnt"))
              .where(col("cnt") >= 2)
              .withColumn("first", element_at(col("s"), 1))
              .withColumn("last", element_at(col("s"), -1))
              // counter resets: every time a sample drops below its
              // predecessor, the predecessor's value is added back
              .withColumn("resets",
                aggregate(
                  zip_with(
                    slice(col("s"), lit(1), size(col("s")) - 1),
                    slice(col("s"), lit(2), size(col("s")) - 1),
                    (a, b) => when(b("value") < a("value"), a("value")).otherwise(lit(0.0))),
                  lit(0.0), (acc, x) => acc + x))
              .withColumn("increase",
                col("last")("value") - col("first")("value") + col("resets"))
              .withColumn("value",
                if (fn == "rate")
                  col("increase") / (col("last")("time") - col("first")("time"))
                else col("increase"))
          case other => throw new IllegalArgumentException(s"unsupported function $other")
        }
        out.select(col("path"), t, col("value"))

      case _: Agg | _: RankK | _: Quantile | _: BinOp | _: SetOp | _: HistQuantile | _: Scalar | _: Offset =>
        throw new IllegalStateException("handled above")
    }
  }

  /** Comparison operators evaluate in Prometheus's filter mode. */
  private val cmpOps = Set(">", "<", ">=", "<=", "==", "!=")

  private def cmpPred(op: String, l: Column, r: Column): Column = op match {
    case ">"  => l > r
    case "<"  => l < r
    case ">=" => l >= r
    case "<=" => l <= r
    case "==" => l === r
    case "!=" => l =!= r
    case other => throw new IllegalArgumentException(s"unsupported operator $other")
  }

  /** The match-group key from a storage path under `m`: the sorted
    * `k=v&…` label string (no leading `?`, no `__name__`) restricted
    * to `on(labels)`, or with `ignoring(labels)` removed, or the full
    * label set by default. Pure column math on the path — paths carry
    * their tags pre-sorted, so the default and ignoring forms preserve
    * canonical order, and the on form re-extracts in sorted key order.
    */
  private[prom] def matchKeyCol(m: Matching): Column = {
    if (m.on) {
      val parts = m.labels.distinct.sorted.map { k =>
        val v = regexp_extract(col("path"),
          "[?&]" + java.util.regex.Pattern.quote(k) + "=([^&]*)", 1)
        when(v =!= "", concat(lit(k + "="), v))
      }
      if (parts.isEmpty) lit("") else concat_ws("&", parts: _*)
    } else {
      val qs = regexp_replace(col("path"), "^[^?]*\\??", "")
      if (m.labels.isEmpty) qs
      else {
        val dropped = array(m.labels.distinct.map(lit): _*)
        array_join(
          filter(split(qs, "&"), x =>
            x =!= "" && !array_contains(dropped, substring_index(x, "=", 1))),
          "&")
      }
    }
  }

  /** `k=v&…` key string → result path (`?k=v&…`, or `""` for the
    * empty label set) — the nameless series Prometheus's arithmetic
    * emits.
    */
  private def namelessPath(key: Column): Column =
    when(key === "", lit("")).otherwise(concat(lit("?"), key))

  /** The arithmetic value column; IEEE division/mod semantics like
    * Prometheus (x/0 = ±Inf, 0/0 = NaN, x%0 = NaN) — spelled out
    * because Spark 4's ANSI mode throws on zero divisors instead.
    */
  private def arithValue(op: String, lv: Column, rv: Column): Column = op match {
    case "+" => lv + rv
    case "-" => lv - rv
    case "*" => lv * rv
    case "/" =>
      when(rv =!= 0.0, lv / rv)
        .when(lv > 0.0, lit(Double.PositiveInfinity))
        .when(lv < 0.0, lit(Double.NegativeInfinity))
        .otherwise(lit(Double.NaN))
    case "%" =>
      // Go math.Mod: sign follows the dividend; x % 0 is NaN
      when(rv =!= 0.0, lv % rv).otherwise(lit(Double.NaN))
    case "^" => pow(lv, rv)
    case other => throw new IllegalArgumentException(s"unsupported operator $other")
  }

  /** The "many" side's path minus its name, with the `group_left(…)`/
    * `group_right(…)` include labels overridden from the "one" side's
    * path, re-sorted into canonical `?k=v&…` form.
    */
  private def mergeIncludePath(
      manyPath: Column, onePath: Column, include: Seq[String]): Column = {
    val qs = regexp_replace(manyPath, "^[^?]*\\??", "")
    if (include.isEmpty) namelessPath(qs)
    else {
      val inc = include.distinct
      val incArr = array(inc.map(lit): _*)
      val kept = filter(split(qs, "&"), x =>
        x =!= "" && !array_contains(incArr, substring_index(x, "=", 1)))
      val added = inc.map { k =>
        val v = regexp_extract(onePath,
          "[?&]" + java.util.regex.Pattern.quote(k) + "=([^&]*)", 1)
        when(v =!= "", concat(lit(k + "="), v))
      }
      val merged = array_sort(
        filter(concat(kept, array(added: _*)), x => x.isNotNull))
      namelessPath(array_join(merged, "&"))
    }
  }

  /** Vector arithmetic/comparison over two matrices: equi-join on
    * (match key, slot). Both sides are already (series × slots) result
    * matrices — fleet-sized, one shuffle each on the join key; never a
    * cartesian product, whatever the matching modifiers.
    *
    *  - one-to-one: the result path IS the match key (Prometheus's
    *    resultMetric drops the name, then keeps only `on` labels /
    *    drops `ignoring` labels — which leaves exactly the key).
    *  - `group_left`/`group_right`: the "one" side is deduplicated
    *    per (key, slot) to its max-(value, path) entry (Prometheus
    *    hard-errors on duplicates — declared divergence); the result
    *    keeps the "many" side's labels sans name plus any `include`
    *    labels copied from the "one" side.
    *  - comparisons FILTER (left rows pass through untouched, name
    *    kept) unless `boolMode`, which emits 0/1 with arithmetic's
    *    label handling. Filter-mode's right side is deduplicated to
    *    its max value per (key, slot) — Prometheus errors on that
    *    duplicate too (declared divergence, ADVICE r6).
    */
  private[prom] def binOpMatrix(
      lm: DataFrame,
      rm: DataFrame,
      op: String,
      boolMode: Boolean = false,
      m: Matching = Matching.default): DataFrame = {
    val key = matchKeyCol(m)
    if (cmpOps(op) && !boolMode) {
      val l2 = lm.select(col("path"), key.as("k"), col("t"), col("value"))
      val r2 = rm.select(key.as("k"), col("t"), col("value").as("rv"))
        .groupBy("k", "t").agg(max("rv").as("rv"))
      return l2.join(r2, Seq("k", "t"))
        .where(cmpPred(op, col("value"), col("rv")))
        .select("path", "t", "value")
    }
    def value(lv: Column, rv: Column): Column =
      if (cmpOps(op)) when(cmpPred(op, lv, rv), lit(1.0)).otherwise(lit(0.0))
      else arithValue(op, lv, rv)
    if (m.side == Matching.OneToOne) {
      val l2 = lm.select(key.as("k"), col("t"), col("value").as("lv"))
      val r2 = rm.select(key.as("k"), col("t"), col("value").as("rv"))
      l2.join(r2, Seq("k", "t"))
        .select(namelessPath(col("k")).as("path"), col("t"),
          value(col("lv"), col("rv")).as("value"))
    } else {
      val (many, one) =
        if (m.side == Matching.GroupLeft) (lm, rm) else (rm, lm)
      val m2 = many.select(col("path"), key.as("k"), col("t"), col("value").as("mv"))
      val o2 = one.select(key.as("k"), col("t"),
          struct(col("value").as("ov"), col("path").as("opath")).as("o"))
        .groupBy("k", "t").agg(max("o").as("o"))
        .select(col("k"), col("t"), col("o.ov").as("ov"), col("o.opath").as("opath"))
      val (lv, rv) =
        if (m.side == Matching.GroupLeft) (col("mv"), col("ov"))
        else (col("ov"), col("mv"))
      m2.join(o2, Seq("k", "t"))
        .select(
          mergeIncludePath(col("path"), col("opath"), m.include).as("path"),
          col("t"), value(lv, rv).as("value"))
    }
  }

  /** Set operators over two matrices, keyed per slot on the match
    * key: `and` = semi-join, `unless` = anti-join, `or` = left ∪
    * (right anti-join left). Full paths (names included) pass through
    * untouched, like Prometheus.
    */
  private[prom] def setOpMatrix(
      lm: DataFrame,
      rm: DataFrame,
      op: String,
      m: Matching = Matching.default): DataFrame = {
    val key = matchKeyCol(m)
    val l2 = lm.select(col("path"), key.as("k"), col("t"), col("value"))
    op match {
      case "and" =>
        l2.join(rm.select(key.as("k"), col("t")), Seq("k", "t"), "left_semi")
          .select("path", "t", "value")
      case "unless" =>
        l2.join(rm.select(key.as("k"), col("t")), Seq("k", "t"), "left_anti")
          .select("path", "t", "value")
      case "or" =>
        val rOnly = rm.select(col("path"), key.as("k"), col("t"), col("value"))
          .join(lm.select(key.as("k"), col("t")), Seq("k", "t"), "left_anti")
        lm.select("path", "t", "value")
          .unionByName(rOnly.select("path", "t", "value"))
      case other => throw new IllegalArgumentException(s"unsupported set operator $other")
    }
  }

  /** Vector–scalar arithmetic: map over the matrix, keeping labels
    * but dropping the name (as Prometheus does for any arithmetic);
    * IEEE division semantics spelled out like [[binOpMatrix]].
    * Comparisons filter (rows survive unchanged, name kept) unless
    * `boolMode`, which emits 0/1 nameless rows.
    */
  private[prom] def scalarOpMatrix(
      m: DataFrame, op: String, s: Double, scalarLeft: Boolean,
      boolMode: Boolean = false): DataFrame = {
    val v = col("value")
    if (cmpOps(op)) {
      val pred = if (scalarLeft) cmpPred(op, lit(s), v) else cmpPred(op, v, lit(s))
      return if (boolMode)
        m.select(regexp_replace(col("path"), "^[^?]*", "").as("path"),
          col("t"), when(pred, lit(1.0)).otherwise(lit(0.0)).as("value"))
      else m.where(pred).select("path", "t", "value")
    }
    val out =
      if (scalarLeft) arithValue(op, lit(s), v) else arithValue(op, v, lit(s))
    m.select(regexp_replace(col("path"), "^[^?]*", "").as("path"),
      col("t"), out.as("value"))
  }

  /** `histogram_quantile(φ, …)` over an inner matrix of cumulative
    * `le` buckets: ONE hash aggregate re-keys each series to its
    * labels-minus-`le` group per slot and collects the (upper bound,
    * count) pairs — bucket lists are scrape-config-sized (tens), so
    * the sort and interpolation stay inside the aggregate row, and the
    * plan shape is identical to [[aggMatrix]] (no window, no join).
    * Algorithm per Prometheus `promql/quantile.go bucketQuantile`:
    * rank = φ·count(+Inf); the first bucket whose cumulative count
    * reaches the rank is linearly interpolated from its lower bound;
    * the +Inf bucket resolves to the highest finite bound; a first
    * bucket with `le ≤ 0` resolves to its own bound; series lacking a
    * +Inf bucket, or with < 2 buckets, yield NaN; φ outside [0,1]
    * yields ±Inf. (No monotonicity repair — see [[HistQuantile]].)
    */
  def histogramQuantileMatrix(base: DataFrame, phi: Double): DataFrame = {
    val leStr = regexp_extract(col("path"), "[?&]le=([^&]*)", 1)
    val leVal = when(leStr === "+Inf", lit(Double.PositiveInfinity))
      .when(leStr === "-Inf", lit(Double.NegativeInfinity))
      .otherwise(leStr.cast("double"))
    // group path: every label but le, nameless (Prometheus drops the
    // name along with le)
    val qs = regexp_replace(col("path"), "^[^?]*\\??", "")
    val gq = array_join(
      filter(split(qs, "&"), x =>
        x =!= "" && substring_index(x, "=", 1) =!= "le"), "&")
    val gpath = namelessPath(gq)
    val b = col("b")
    val grouped = base
      .where(leStr =!= "" && leVal.isNotNull)
      .groupBy(gpath.as("path"), col("t"))
      .agg(array_sort(
        collect_list(struct(leVal.as("le"), col("value").as("cnt")))).as("b"))
      .withColumn("n", size(b))
      .withColumn("obs", element_at(b, -1)("cnt"))
      .withColumn("rank", lit(phi) * col("obs"))
      // 0-based index of the first bucket whose count reaches the
      // rank (bucket lists are tiny — the lambda scan is in-row)
      .withColumn("bidx",
        least(size(filter(b, x => x("cnt") < col("rank"))), col("n") - 1))
    def at(i: Column) = element_at(b, i + lit(1)) // 0-based helper
    val cur = at(col("bidx"))
    val prevCnt = when(col("bidx") > 0, at(col("bidx") - 1)("cnt")).otherwise(lit(0.0))
    val bucketStart = when(col("bidx") > 0, at(col("bidx") - 1)("le")).otherwise(lit(0.0))
    val interp = bucketStart +
      (cur("le") - bucketStart) * (col("rank") - prevCnt) / (cur("cnt") - prevCnt)
    val value =
      if (phi < 0.0) lit(Double.NegativeInfinity)
      else if (phi > 1.0) lit(Double.PositiveInfinity)
      else when(col("n") < 2 ||
          element_at(b, -1)("le") =!= lit(Double.PositiveInfinity) ||
          col("obs") === 0.0, lit(Double.NaN))
        .when(col("bidx") === col("n") - 1, at(col("n") - 2)("le"))
        .when(col("bidx") === 0 && cur("le") <= 0.0, cur("le"))
        .otherwise(interp)
    grouped.select(col("path"), col("t"), value.as("value"))
  }

  /** Prometheus aggregation over matrix rows: re-key each series to
    * its `by`-label subset (labels decoded straight out of the storage
    * path, re-encoded sorted into the nameless `?k=v&…` form) and run
    * ONE more hash aggregate on (group, slot). A label the series
    * lacks — or carries empty, which Prometheus treats as absent — is
    * dropped from the group key; empty `by` collapses everything onto
    * the empty path (= the empty label set).
    */
  private[prom] def aggMatrix(
      base: DataFrame,
      op: String,
      by: Seq[String],
      phi: Double = Double.NaN): DataFrame = {
    val parts = by.distinct.sorted.map { k =>
      val v = regexp_extract(col("path"),
        "[?&]" + java.util.regex.Pattern.quote(k) + "=([^&]*)", 1)
      when(v =!= "", concat(lit(k + "="), v))
    }
    val qs = if (parts.isEmpty) lit("") else concat_ws("&", parts: _*)
    val gpath = when(qs === "", lit("")).otherwise(concat(lit("?"), qs))
    val g = base.groupBy(gpath.as("path"), col("t"))
    val out = op match {
      case "sum"   => g.agg(sum("value").as("value"))
      case "avg"   => g.agg(avg("value").as("value"))
      case "min"   => g.agg(min("value").as("value"))
      case "max"   => g.agg(max("value").as("value"))
      case "count" => g.agg(count(lit(1)).cast("double").as("value"))
      case "group" => g.agg(max(lit(1.0)).as("value"))
      // population forms, like Prometheus's stddev/stdvar
      case "stddev" => g.agg(stddev_pop(col("value")).as("value"))
      case "stdvar" => g.agg(var_pop(col("value")).as("value"))
      // exact linear-interpolation quantile: per-(group, slot) value
      // counts are fleet-sized, so the exact sort stays inside the
      // aggregate — no approx sketch needed at this cardinality
      case "quantile" => g.agg(percentile(col("value"), lit(phi)).as("value"))
      case other   => throw new IllegalArgumentException(s"unsupported aggregation $other")
    }
    out.select("path", "t", "value")
  }

  /** `topk`/`bottomk` over matrix rows: one window rank per grid slot
    * (shuffle on `t`; per-slot row count = matched series count, so
    * the window state is fleet-sized, not sample-sized). Ties break on
    * path for deterministic output.
    */
  private[prom] def rankMatrix(base: DataFrame, op: String, k: Int): DataFrame = {
    val ord =
      if (op == "topk") Seq(col("value").desc, col("path").asc)
      else Seq(col("value").asc, col("path").asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("t")).orderBy(ord: _*)
    base.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("path", "t", "value")
  }

  /** Driver-side label decode of a storage path (`name?k=v&…`) for
    * response assembly — the scalar twin of [[Prom.labels]]. Aggregated
    * series come back nameless (`?k=v&…` or fully empty for the empty
    * label set) and decode without a `__name__` entry, matching
    * Prometheus's name-dropping aggregation output.
    */
  def labelsOf(path: String): Seq[(String, String)] = {
    val q = path.indexOf('?')
    if (path.isEmpty) Seq.empty
    else if (q < 0) Seq("__name__" -> path)
    else {
      val kvs = path.substring(q + 1).split("&").toSeq.map { kv =>
        val eq = kv.indexOf('=')
        if (eq < 0) kv -> "" else kv.substring(0, eq) -> kv.substring(eq + 1)
      }
      val name = path.substring(0, q)
      val named = if (name.isEmpty) kvs else ("__name__" -> name) +: kvs
      named.sortBy(_._1)
    }
  }

  /** Prometheus's shortest-form sample value formatting. */
  def fmtValue(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v.isPosInfinity) "+Inf"
    else if (v.isNegInfinity) "-Inf"
    else if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** `(path, t, value)` matrix rows → the `/api/v1/query_range` JSON
    * envelope (`{"status":"success","data":{"resultType":"matrix",…}}`).
    */
  def matrixJson(rows: Seq[(String, Long, Double)], jstr: String => String): String = {
    val series = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (path, rs) =>
      val metric = labelsOf(path)
        .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
      val values = rs.sortBy(_._2)
        .map { case (_, t, v) => s"[$t,${jstr(fmtValue(v))}]" }.mkString("[", ",", "]")
      s"""{"metric":$metric,"values":$values}"""
    }
    s"""{"status":"success","data":{"resultType":"matrix","result":${series.mkString("[", ",", "]")}}}"""
  }

  /** `(path, t, value)` rows at one instant → the `/api/v1/query`
    * JSON envelope (`resultType: "vector"`, one `value` per series).
    */
  def vectorJson(rows: Seq[(String, Long, Double)], jstr: String => String): String = {
    val series = rows.sortBy(_._1).map { case (path, t, v) =>
      val metric = labelsOf(path)
        .map { case (k, lv) => s"${jstr(k)}:${jstr(lv)}" }.mkString("{", ",", "}")
      s"""{"metric":$metric,"value":[$t,${jstr(fmtValue(v))}]}"""
    }
    s"""{"status":"success","data":{"resultType":"vector","result":${series.mkString("[", ",", "]")}}}"""
  }
}
