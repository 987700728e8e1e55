package graft.engine

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.compiler.Tagged
import graft.model.FeatureFlags

/** Tag autocomplete over the tagged inverted index — the Spark-native
  * analog of `autocomplete/autocomplete.go:232-652`.
  *
  * Both endpoints are a filtered scan + distinct + order + limit; the
  * expr constraints reuse the same tagged-predicate compiler as the
  * finder, so the `tag1` fast path and parquet stats pruning apply.
  */
object Autocomplete {

  /** `/tags/autoComplete/tags`: distinct tag names, optionally
    * constrained by seriesByTag-style exprs and a name prefix
    * (`autocomplete.go:350-374`). Tag names are extracted with
    * `splitByChar('=', Tag1)[1]` in the reference — here
    * `substring_index(tag1, '=', 1)` over the exploded inverted index.
    */
  def tagNames(
      tags: DataFrame,
      exprs: List[String] = Nil,
      tagPrefix: String = "",
      limit: Int = 10000,
      flags: FeatureFlags = FeatureFlags()): DataFrame = {
    val constrained = applyExprs(tags, exprs, flags)
    val name = substring_index(col("tag1"), "=", 1).as("value")
    val base = constrained.select(name)
      .where(if (tagPrefix.nonEmpty) col("value").startsWith(tagPrefix) else lit(true))
    base.distinct().orderBy(col("value")).limit(limit)
  }

  /** Full `/tags/autoComplete/tags` post-processing
    * (`autocomplete.go:443-478`): `__name__` displays as `name` (and
    * is injected if absent), tags already fixed by the query's exprs
    * are dropped, then sort + re-limit. The storage scan stays
    * distributed; this reshapes the (limit-bounded) result.
    */
  def tagNamesComplete(
      tags: DataFrame,
      exprs: List[String] = Nil,
      tagPrefix: String = "",
      limit: Int = 10000,
      flags: FeatureFlags = FeatureFlags()): Seq[String] = {
    val usedTags: Set[String] = Tagged.parseConditions(exprs, flags) match {
      case Right(terms) =>
        terms.filter(t => t.op == Tagged.Op.Eq && !t.hasWildcard)
          .map(t => if (t.key == "__name__") "name" else t.key).toSet
      case Left(_) => Set.empty
    }
    val raw = tagNames(tags, exprs, tagPrefix, limit, flags)
      .collect().map(_.getString(0))
      .map(t => if (t == "__name__") "name" else t)
      .filterNot(usedTags)
    val withName =
      if (!raw.contains("name") && !usedTags("name") &&
        (tagPrefix.isEmpty || "name".startsWith(tagPrefix)))
        raw :+ "name"
      else raw
    withName.sorted.take(limit).toSeq
  }

  /** `/tags/autoComplete/values`: distinct values of one tag,
    * optionally constrained and value-prefixed (`autocomplete.go:640-652`):
    * `substr(Tag1, len(tag)+2)` over rows whose `tag1` starts with
    * `tag=valuePrefix`.
    */
  def tagValues(
      tags: DataFrame,
      tag: String,
      exprs: List[String] = Nil,
      valuePrefix: String = "",
      limit: Int = 10000,
      flags: FeatureFlags = FeatureFlags()): DataFrame = {
    // the graphite-web pseudo-tag `name` is stored as `__name__`
    // (`autocomplete.go:520-527`)
    val storageTag = if (tag == "name") "__name__" else tag
    val constrained = applyExprs(tags, exprs, flags)
    constrained
      .where(col("tag1").startsWith(s"$storageTag=$valuePrefix"))
      .select(expr(s"substring(tag1, ${storageTag.length + 2})").as("value"))
      .distinct()
      .orderBy(col("value"))
      .limit(limit)
  }

  /** Constrain the tags table by seriesByTag expr terms: the matching
    * series are found first (same predicate as the tagged finder),
    * then the inverted index is semi-joined back to those paths —
    * mirroring the reference's `WHERE Path IN (SELECT Path WHERE …)`
    * nesting (`autocomplete.go:300-340`). The found-path side is
    * find-result-sized → broadcast.
    */
  /** Date-bounded variant (`tagged-autocomplete-days`,
    * `autocomplete.go:330-346`): only series active in the window
    * contribute names/values.
    */
  def tagValuesDated(
      tags: DataFrame,
      tag: String,
      from: Long,
      until: Long,
      exprs: List[String] = Nil,
      valuePrefix: String = "",
      limit: Int = 10000,
      flags: FeatureFlags = FeatureFlags()): DataFrame = {
    val dated = tags.where(col("date").between(
      to_date(timestamp_seconds(lit(from))),
      to_date(timestamp_seconds(lit(until)))))
    tagValues(dated, tag, exprs, valuePrefix, limit, flags)
  }

  /** Admission gate for autocomplete exprs (`tags-min-in-autocomplete`,
    * `finder/tagged.go:357-360`): require at least `minTags` exact
    * non-wildcard terms before scanning.
    */
  def checkTagsMinInAutocomplete(
      exprs: List[String],
      minTags: Int,
      flags: FeatureFlags = FeatureFlags()): Either[String, Unit] = {
    if (minTags <= 0) return Right(())
    val terms = Tagged.parseConditions(exprs, flags).getOrElse(Nil)
    if (Tagged.nonWildcardEqCount(terms) < minTags)
      Left("seriesByTag argument has too much wildcard and regex terms")
    else Right(())
  }

  private def applyExprs(tags: DataFrame, exprs: List[String], flags: FeatureFlags): DataFrame =
    if (exprs.isEmpty) tags
    else {
      val terms = Tagged.parseConditions(exprs, flags) match {
        case Right(t) => t
        case Left(e)  => throw new IllegalArgumentException(e)
      }
      val matching = tags
        .where(Tagged.wherePredicate(col("tag1"), col("tags"), terms, flags))
        .select("path").distinct()
      tags.join(broadcast(matching), Seq("path"), "left_semi")
    }
}
