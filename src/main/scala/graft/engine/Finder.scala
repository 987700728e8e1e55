package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.compiler.{GlobCompiler, Tagged}
import graft.glob.{Glob, Paths}
import graft.model.{FeatureFlags, Schemas}

/** Metric-name finder over the index table — the Spark-native analog
  * of `finder/index.go` + `finder/finder.go`.
  *
  * Builds one declarative filter (level + date + glob predicate) per
  * query; Catalyst pushes the level equality and the literal-prefix
  * `startsWith` down to the parquet scan, which plays the role the
  * ClickHouse `(Level, Path, Date)` primary index played.
  */
object Finder {

  /** Direct vs reversed representation choice (`finder/index.go:100-130`):
    * use the reversed rows when the first wildcard sits deeper from the
    * right than from the left (e.g. `*.cpu.load` — reversed prefix
    * `load.cpu.` is selective, direct prefix is empty).
    */
  def useReverse(query: String): Boolean = {
    val w = Glob.indexWildcard(query)
    if (w < 0) return false // no wildcard: direct
    // dot COUNTS on each flank, as the reference computes them
    // (`finder/index.go:111-123`) — not character positions
    val firstWildcardNode = query.substring(0, w).count(_ == '.')
    val lastWildcardNode = query.substring(Glob.indexLastWildcard(query)).count(_ == '.')
    firstWildcardNode < lastWildcardNode
  }

  /** Config-aware chooser (`finder/index.go:100-130` with the
    * `index-reverse`/`index-reverses` overrides): a forced global
    * mode wins outright (even for wildcard-free queries — matching
    * the reference's `Test_useReverseWithSetConfig`), then the first
    * matching per-target rule, then the dot-count heuristic.
    */
  def useReverse(query: String, policy: Routing.ReversePolicy): Boolean = {
    import Routing.ReverseMode
    policy.mode match {
      case ReverseMode.Direct   => false
      case ReverseMode.Reversed => true
      case ReverseMode.Auto =>
        Routing.checkReverses(query, policy.rules) match {
          case ReverseMode.Direct   => false
          case ReverseMode.Reversed => true
          case ReverseMode.Auto     => useReverse(query)
        }
    }
  }

  /** Admission control (`wildcard-min-distance`, `finder/index.go:180-197`):
    * reject queries whose wildcards hug both ends of the path.
    * Single-node queries are exempt — "allows to check which root
    * nodes exist" (`index.go:187-191`).
    */
  def checkWildcardDistance(query: String, minDistance: Int): Either[String, Unit] = {
    if (minDistance <= 0) return Right(())
    val d = Glob.maxWildcardDistance(query)
    val moreThanOneNode = query.count(_ == '.') >= 1
    if (d >= 0 && d < minDistance && moreThanOneNode)
      Left(s"query has wildcards way too early at the start and at the end of it")
    else Right(())
  }

  /** Compile a find query into (filterColumn, usedReverse). Daily rows
    * (`useDaily`) add a date-range filter; all-time rows use the
    * constant tree date with the level offsets of `finder/index.go:19-23`.
    */
  def compile(
      query0: String,
      from: Long = 0,
      until: Long = 0,
      reverse: Option[Boolean] = None,
      reversePolicy: Routing.ReversePolicy = Routing.ReversePolicy()): (Column, Boolean) = {
    val query = Glob.clearGlob(query0)
    val rev = reverse.getOrElse(useReverse(query, reversePolicy))
    val q = if (rev) Paths.reverse(query) else query
    val depth = Paths.level(q)
    val useDaily = from > 0 && until > 0
    val levelOffset =
      if (useDaily) { if (rev) Schemas.ReverseLevelOffset else 0 }
      else { if (rev) Schemas.ReverseTreeLevelOffset else Schemas.TreeLevelOffset }

    val levelPred = col("level") === (depth + levelOffset)
    val datePred =
      if (useDaily)
        col("date").between(
          to_date(timestamp_seconds(lit(from))),
          to_date(timestamp_seconds(lit(until))))
      else col("date") === lit(Schemas.DefaultTreeDate).cast("date")

    (levelPred && datePred && GlobCompiler.treeGlob(col("path"), q), rev)
  }

  /** Run a find: distinct matching paths with the non-leaf marker
    * decoded from the trailing dot (`finder/finder.go:116-122`).
    * Returns (path, is_leaf) in display (direct) orientation.
    */
  def find(
      index: DataFrame,
      query: String,
      from: Long = 0,
      until: Long = 0,
      wildcardMinDistance: Int = 0,
      reversePolicy: Routing.ReversePolicy = Routing.ReversePolicy()): DataFrame = {
    checkWildcardDistance(Glob.clearGlob(query), wildcardMinDistance) match {
      case Left(e)  => throw new IllegalArgumentException(e)
      case Right(_) =>
    }
    val (pred, rev) = compile(query, from, until, reversePolicy = reversePolicy)
    val raw = index.where(pred).select("path").distinct()
    val oriented =
      if (rev) raw.select(GraphiteTables.reversePath(col("path")).as("path"))
      else raw
    oriented.select(
      when(col("path").endsWith("."), expr("substring(path, 1, length(path)-1)"))
        .otherwise(col("path")).as("path"),
      (!col("path").endsWith(".")).as("is_leaf"))
  }

  /** Split find (U2, `finder/split.go:72-128`): brace-split the query
    * into selective disjuncts and run ONE scan with the OR of their
    * predicates; orientation chosen from the first wildcarded disjunct
    * (`whereFilter`, `split.go:241-259`). Falls back to the plain find
    * when the query doesn't split.
    */
  def findSplit(
      index: DataFrame,
      query: String,
      maxNodeToSplitIndex: Int = 2,
      from: Long = 0,
      until: Long = 0): DataFrame = {
    val queries = graft.glob.Split.splitQuery(query, maxNodeToSplitIndex) match {
      case Right(qs) => qs
      case Left(e)   => throw new IllegalArgumentException(e)
    }
    if (queries.length <= 1) return find(index, query, from, until)
    val rev = queries.find(Glob.hasWildcard).map(useReverse)
      .getOrElse(useReverse(queries.head))
    val oriented = queries.map(q => if (rev) Paths.reverse(q) else q)
    val useDaily = from > 0 && until > 0
    val levelOffset =
      if (useDaily) { if (rev) Schemas.ReverseLevelOffset else 0 }
      else { if (rev) Schemas.ReverseTreeLevelOffset else Schemas.TreeLevelOffset }
    val datePred =
      if (useDaily)
        col("date").between(
          to_date(timestamp_seconds(lit(from))),
          to_date(timestamp_seconds(lit(until))))
      else col("date") === lit(Schemas.DefaultTreeDate).cast("date")
    // per-disjunct level (brace choices can alter depth) + glob, OR'd
    val pred = datePred && oriented
      .map(q => col("level") === (Paths.level(q) + levelOffset) &&
        GlobCompiler.treeGlob(col("path"), q))
      .reduceLeft(_ || _)
    val raw = index.where(pred).select("path").distinct()
    val display =
      if (rev) raw.select(GraphiteTables.reversePath(col("path")).as("path"))
      else raw
    display.select(
      when(col("path").endsWith("."), expr("substring(path, 1, length(path)-1)"))
        .otherwise(col("path")).as("path"),
      (!col("path").endsWith(".")).as("is_leaf"))
  }

  /** Tagged find with cost-based term ordering from live cardinality
    * stats (J5, `PrepareTaggedTerms`, `finder/tagged.go:614-637`): the
    * lowest-count exact term becomes the `tag1` primary filter. Result
    * set is identical to the uncosted find — the stats only steer
    * which predicate hits the inverted-index column.
    */
  def findTaggedCosted(
      tags: DataFrame,
      countTable: DataFrame,
      expr: String,
      flags: FeatureFlags = FeatureFlags(),
      configuredCosts: Map[String, Tagged.Costs] = Map.empty,
      from: Long = 0,
      until: Long = 0): DataFrame = {
    val parsed = Tagged.parseSeriesByTag(expr, flags) match {
      case Right(t) => t
      case Left(e)  => throw new IllegalArgumentException(e)
    }
    val terms = TagStats.prepareTerms(parsed, Some(countTable), configuredCosts, from, until)
    val pred = Tagged.wherePredicate(col("tag1"), col("tags"), terms, flags)
    val datePred =
      if (from > 0 && until > 0)
        col("date").between(
          to_date(timestamp_seconds(lit(from))),
          to_date(timestamp_seconds(lit(until))))
      else lit(true)
    tags.where(datePred && pred).select("path").distinct()
  }

  /** Tagged find: seriesByTag expression → distinct storage paths
    * (`finder/tagged.go:440-502`). The first (most selective) term
    * lands on the `tag1` inverted-index column; the rest filter the
    * `tags` array.
    */
  def findTagged(
      tags: DataFrame,
      expr: String,
      flags: FeatureFlags = FeatureFlags(),
      from: Long = 0,
      until: Long = 0,
      tagsMinInQuery: Int = 0): DataFrame = {
    val terms = Tagged.parseSeriesByTag(expr, flags) match {
      case Right(t) => t
      case Left(e)  => throw new IllegalArgumentException(e)
    }
    // admission gate (`finder/tagged.go:357-363` → HTTP 403)
    if (tagsMinInQuery > 0 && Tagged.nonWildcardEqCount(terms) < tagsMinInQuery)
      throw new IllegalArgumentException(
        "seriesByTag argument has too much wildcard and regex terms")
    val pred = Tagged.wherePredicate(col("tag1"), col("tags"), terms, flags)
    val datePred =
      if (from > 0 && until > 0)
        col("date").between(
          to_date(timestamp_seconds(lit(from))),
          to_date(timestamp_seconds(lit(until))))
      else lit(true)
    tags.where(datePred && pred).select("path").distinct()
  }
}
