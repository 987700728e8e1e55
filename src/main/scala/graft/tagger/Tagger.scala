package graft.tagger

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Lineage.TruncateOps

/** The tagger batch job (S10) — Spark-native analog of
  * `tagger/tagger.go:76-370` + `tagger/rule.go:12-120`: take every
  * metric path in the index tree (metric + ancestors), match TOML
  * rules, propagate tags along the tree, and emit one tagged-table
  * row per (path, tag).
  *
  * Propagation semantics (faithful to the reference's two passes over
  * the lexicographically sorted metric list):
  *   - downward: a node inherits every tag matched on any ancestor
  *     (the match pass seeds each node with its parent's tags — full
  *     transitive inheritance since parents sort first);
  *   - upward: a parent additionally receives its *direct* children's
  *     downward tag sets (the copy pass merges child→parent after the
  *     parent was itself merged up, so grandchildren do NOT reach
  *     grandparents — a quirk we reproduce).
  *
  * Scale shape: rules are a broadcast-sized Column expression; both
  * propagation passes are explode + hash-aggregate over the metric
  * dimension (linear in |paths| × depth, independent of point count).
  */
object Tagger {

  /** One tagging rule (`tagger/rule.go:12-26`): at most one selector
    * (equal / has-prefix / has-suffix / contains / regexp — an empty
    * regexp matches everything, as Go's `regexp.Compile("")` does) and
    * the tags it adds.
    */
  final case class Rule(
      tags: List[String],
      equal: String = "",
      hasPrefix: String = "",
      hasSuffix: String = "",
      contains: String = "",
      regexp: String = "")

  /** Minimal TOML-subset parser for the tagger rule files
    * (`[[rule]]` blocks; `tag = "x"`, `tags = ["a", "b"]`, and the
    * five selector keys). Mirrors what `BurntSushi/toml` accepts for
    * the reference's rule shape; unknown keys are an error.
    */
  def parseRules(content: String): List[Rule] = {
    val blocks = List.newBuilder[Map[String, Either[String, List[String]]]]
    var current: Map[String, Either[String, List[String]]] = null
    content.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .foreach { line =>
        if (line == "[[rule]]") {
          if (current != null) blocks += current
          current = Map.empty
        } else {
          require(current != null, s"key outside [[rule]] block: $line")
          val eq = line.indexOf('=')
          require(eq > 0, s"can't parse rule line: $line")
          val key = line.substring(0, eq).trim
          val raw = line.substring(eq + 1).trim
          val value: Either[String, List[String]] =
            if (raw.startsWith("[")) {
              require(raw.endsWith("]"), s"unterminated array: $line")
              Right(raw.substring(1, raw.length - 1).split(",").toList
                .map(_.trim).filter(_.nonEmpty).map(unquote))
            } else Left(unquote(raw))
          current += (key -> value)
        }
      }
    if (current != null) blocks += current
    blocks.result().map { kv =>
      def str(k: String): String = kv.get(k).map(_.left.getOrElse(
        throw new IllegalArgumentException(s"$k must be a string"))).getOrElse("")
      val single = str("tag")
      val list = kv.get("tags").map(_.toOption.getOrElse(
        throw new IllegalArgumentException("tags must be an array"))).getOrElse(Nil)
      val known = Set("tag", "tags", "equal", "has-prefix", "has-suffix", "contains", "regexp")
      kv.keys.find(!known.contains(_)).foreach(k =>
        throw new IllegalArgumentException(s"unknown rule key: $k"))
      Rule(
        tags = (if (single.nonEmpty) List(single) else Nil) ++ list,
        equal = str("equal"),
        hasPrefix = str("has-prefix"),
        hasSuffix = str("has-suffix"),
        contains = str("contains"),
        regexp = str("regexp"))
    }
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.startsWith("\"") && s.endsWith("\"")) s.substring(1, s.length - 1)
    else s

  /** Compile the rule list into one Column: the array of tags matched
    * directly by a path. Selectors AND within a rule (the reference
    * stores one selector per tree, but a rule with several must pass
    * all to match — `rule.go:107-119` routes by the first non-empty).
    */
  def matchedTags(path: Column, rules: List[Rule]): Column = {
    if (rules.isEmpty) return array().cast("array<string>")
    val perRule = rules.map { r =>
      var pred: Column = lit(true)
      if (r.equal.nonEmpty) pred = pred && path === r.equal
      if (r.hasPrefix.nonEmpty) pred = pred && path.startsWith(r.hasPrefix)
      if (r.hasSuffix.nonEmpty) pred = pred && path.endsWith(r.hasSuffix)
      if (r.contains.nonEmpty) pred = pred && path.contains(r.contains)
      if (r.regexp.nonEmpty) pred = pred && regexp_like(path, lit(r.regexp))
      when(pred, array(r.tags.map(lit): _*))
        .otherwise(array().cast("array<string>"))
    }
    array_distinct(concat(perRule: _*))
  }

  /** Run the tagger over the index tree rows: input must have a
    * `path` column of tree entries (metric paths; ancestors carry the
    * trailing dot), plus passthrough `date` and `version`. Returns
    * tagged-table rows (date, tag1, path, tags, version, is_leaf) —
    * one per (path, matched tag), only for paths with ≥1 tag
    * (`tagger.go:294-296`).
    */
  def tag(tree: DataFrame, rules: List[Rule]): DataFrame = {
    // `base` feeds four consumers (chain explode, the down join, the
    // child merge, the final join) and `down` two — materialize each
    // once instead of re-running the distinct + per-rule regex match
    // per consumer
    val base = tree.select(col("path"), col("date"), col("version")).distinct()
      .withColumn("matched", matchedTags(col("path"), rules))
      .truncateLineageDeferred()

    // ancestors-or-self pairs: (x, each prefix chain entry of x)
    val segs = split(regexp_replace(col("path"), "\\.$", ""), "\\.")
    val withChain = base.withColumn(
      "chain",
      concat(
        transform(
          sequence(lit(1), size(segs) - 1),
          k => concat(concat_ws(".", slice(segs, lit(1), k)), lit("."))),
        array(col("path"))))

    val pairs = withChain
      .select(col("path").as("x"), explode(col("chain")).as("y"))

    val down = pairs
      .join(base.select(col("path").as("y"), col("matched")), Seq("y"))
      .groupBy(col("x").as("path"))
      .agg(array_distinct(flatten(collect_list(col("matched")))).as("down"))
      .truncateLineageDeferred()

    // one-hop upward: parent ← union of direct children's down sets
    val parentOf = concat(
      concat_ws(".", slice(segs, lit(1), size(segs) - 1)), lit("."))
    val childMerge = base
      .where(size(segs) > 1)
      .select(parentOf.as("path"), col("path").as("child"))
      .join(down.select(col("path").as("child"), col("down").as("child_down")), Seq("child"))
      .groupBy("path")
      .agg(array_distinct(flatten(collect_list(col("child_down")))).as("from_children"))

    val finalTags = down
      .join(childMerge, Seq("path"), "left_outer")
      .select(col("path"),
        array_distinct(concat(col("down"),
          coalesce(col("from_children"), array().cast("array<string>")))).as("tags"))
      .where(size(col("tags")) > 0)

    base.select(col("path"), col("date"), col("version"))
      .join(finalTags, Seq("path"))
      .select(
        col("date"),
        explode(col("tags")).as("tag1"),
        col("path"),
        col("tags"),
        col("version"),
        (!col("path").endsWith(".")).as("is_leaf"))
  }
}
