package graft.prom

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Minimal PromQL subset for `/api/v1/query_range` and
  * `/api/v1/query` — enough for a
  * Prometheus UI smoke over the Graphite-tagged storage: an instant
  * vector selector, `rate`/`increase`/`*_over_time` over a range
  * selector, `sum`/`avg`/`min`/`max`/`count`/`stddev`/`stdvar`/
  * `group`/`quantile(φ, …)` aggregation with `by (label, …)`
  * grouping, `topk`/`bottomk` selection, and space-separated vector
  * arithmetic (`a / b`, one-to-one label matching) over any
  * of those. The reference serves full PromQL by importing the stock
  * upstream engine (`prometheus/run.go:28-83`); this evaluator covers
  * the selector/rate subset natively instead, on the same
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

  /** `lhs op rhs` for op ∈ + - * / — vector arithmetic with
    * Prometheus's default one-to-one matching on the full label set
    * ignoring `__name__` (the name is dropped from the result, as
    * Prometheus does). Declared divergence: if several series on one
    * side share a label set (same labels, different names) the match
    * degenerates to many-to-many instead of Prometheus's hard error.
    */
  final case class BinOp(op: String, lhs: Expr, rhs: Expr) extends Expr {
    def matchers: Seq[(String, String, String)] = lhs.matchers
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
    val fnMatch = "^([a-z_]+)\\((.*)\\)$".r
    // binary operators split at paren/brace/bracket/quote depth 0 —
    // last +/- first (left-assoc, lowest precedence), then last */
    splitBinOp(q) match {
      case Some((op, l, r)) =>
        return for { le <- parse(l); re <- parse(r) } yield BinOp(op, le, re)
      case None =>
    }
    q match {
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
          case None    => Prom.parseSelector(base).map(Selector(_))
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

  /** Find the top-level binary operator to split at, loosest
    * precedence first (Prometheus order): the LAST depth-0 spaced
    * comparison (`== != > < >= <=`), else the last `+`/`-`, else the
    * last `*`/`/` — last occurrence for left-associativity. The
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
    lastSpaced(Seq("==", "!=", ">=", "<=", ">", "<"))
      .orElse(lastSpaced(Seq("+", "-")))
      .orElse(lastSpaced(Seq("*", "/")))
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
      case BinOp(op, l, r) =>
        return (l, r) match {
          case (Scalar(_), Scalar(_)) =>
            throw new IllegalArgumentException("scalar-only expressions are not supported")
          case (Scalar(a), e) =>
            scalarOpMatrix(
              evalMatrix(points, tags, e, start, end, step0, lookbackSec),
              op, a, scalarLeft = true)
          case (e, Scalar(b)) =>
            scalarOpMatrix(
              evalMatrix(points, tags, e, start, end, step0, lookbackSec),
              op, b, scalarLeft = false)
          case _ =>
            binOpMatrix(
              evalMatrix(points, tags, l, start, end, step0, lookbackSec),
              evalMatrix(points, tags, r, start, end, step0, lookbackSec), op)
        }
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
      case _: Agg | _: RankK | _: Quantile | _: BinOp | _: Scalar | _: Offset =>
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

      case _: Agg | _: RankK | _: Quantile | _: BinOp | _: Scalar | _: Offset =>
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

  /** Vector arithmetic over two matrices: equi-join on (label set
    * without the name, slot). Both sides are already (series × slots)
    * result matrices — fleet-sized, one shuffle each on the join key;
    * the result is nameless like Prometheus's arithmetic output.
    * Comparisons instead FILTER: left-side series (full path, name
    * kept) survive where the comparison holds, like Prometheus's
    * filter-mode comparison without `bool`.
    */
  private[prom] def binOpMatrix(lm: DataFrame, rm: DataFrame, op: String): DataFrame = {
    if (cmpOps(op)) {
      val key = regexp_replace(col("path"), "^[^?]*", "")
      val l2 = lm.select(col("path"), key.as("k"), col("t"), col("value"))
      val r2 = rm.select(key.as("k"), col("t"), col("value").as("rv"))
      return l2.join(r2, Seq("k", "t"))
        .where(cmpPred(op, col("value"), col("rv")))
        .select("path", "t", "value")
    }
    def keyed(m: DataFrame, v: String) = m.select(
      regexp_replace(col("path"), "^[^?]*", "").as("path"),
      col("t"), col("value").as(v))
    val joined = keyed(lm, "lv").join(keyed(rm, "rv"), Seq("path", "t"))
    val value = op match {
      case "+" => col("lv") + col("rv")
      case "-" => col("lv") - col("rv")
      case "*" => col("lv") * col("rv")
      case "/" =>
        // IEEE semantics like Prometheus (x/0 = ±Inf, 0/0 = NaN) —
        // spelled out because Spark 4's ANSI mode makes `/` throw on
        // a zero divisor instead
        when(col("rv") =!= 0.0, col("lv") / col("rv"))
          .when(col("lv") > 0.0, lit(Double.PositiveInfinity))
          .when(col("lv") < 0.0, lit(Double.NegativeInfinity))
          .otherwise(lit(Double.NaN))
      case other => throw new IllegalArgumentException(s"unsupported operator $other")
    }
    joined.select(col("path"), col("t"), value.as("value"))
  }

  /** Vector–scalar arithmetic: map over the matrix, keeping labels
    * but dropping the name (as Prometheus does for any arithmetic);
    * IEEE division semantics spelled out like [[binOpMatrix]].
    */
  private[prom] def scalarOpMatrix(
      m: DataFrame, op: String, s: Double, scalarLeft: Boolean): DataFrame = {
    val v = col("value")
    if (cmpOps(op)) {
      // filter mode: rows survive unchanged, full path (name) kept
      val pred = if (scalarLeft) cmpPred(op, lit(s), v) else cmpPred(op, v, lit(s))
      return m.where(pred).select("path", "t", "value")
    }
    def divide(num: Column, den: Column): Column =
      when(den =!= 0.0, num / den)
        .when(num > 0.0, lit(Double.PositiveInfinity))
        .when(num < 0.0, lit(Double.NegativeInfinity))
        .otherwise(lit(Double.NaN))
    val out = (op, scalarLeft) match {
      case ("+", _)     => v + lit(s)
      case ("*", _)     => v * lit(s)
      case ("-", false) => v - lit(s)
      case ("-", true)  => lit(s) - v
      case ("/", false) => divide(v, lit(s))
      case ("/", true)  => divide(lit(s), v)
      case (other, _) => throw new IllegalArgumentException(s"unsupported operator $other")
    }
    m.select(regexp_replace(col("path"), "^[^?]*", "").as("path"),
      col("t"), out.as("value"))
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
