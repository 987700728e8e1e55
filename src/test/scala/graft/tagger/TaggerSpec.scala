package graft.tagger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Tagger batch job: TOML rules, selector matching, downward
  * inheritance, one-hop upward merge (`tagger/tagger.go:200-300`,
  * `tagger/rule.go`).
  */
class TaggerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("parseRules: toml subset") {
    val rules = Tagger.parseRules(
      """
      |# comment
      |[[rule]]
      |has-prefix = "app."
      |tag = "application"
      |
      |[[rule]]
      |regexp = "cpu[0-9]+$"
      |tags = ["cpu", "hardware"]
      |
      |[[rule]]
      |equal = "exact.path"
      |has-suffix = ".total"
      |tag = "both"
      """.stripMargin)
    assert(rules.length == 3)
    assert(rules(0) == Tagger.Rule(List("application"), hasPrefix = "app."))
    assert(rules(1) == Tagger.Rule(List("cpu", "hardware"), regexp = "cpu[0-9]+$"))
    assert(rules(2) == Tagger.Rule(List("both"), equal = "exact.path", hasSuffix = ".total"))
    intercept[IllegalArgumentException](Tagger.parseRules("[[rule]]\nbogus-key = \"x\""))
  }

  test("tag: selectors, downward inheritance, one-hop upward merge") {
    import spark.implicits._
    // tree for metrics a.b.c and a.other (plus ancestors)
    val tree = Seq("a.", "a.b.", "a.b.c", "a.other")
      .map(p => (p, java.sql.Date.valueOf("2024-01-01"), 1L))
      .toDF("path", "date", "version")
    val rules = List(
      Tagger.Rule(List("roots"), hasPrefix = "a."),    // matches all (every path starts "a.")
      Tagger.Rule(List("leafc"), equal = "a.b.c"),
      Tagger.Rule(List("bee"), hasPrefix = "a.b."))
    val out = Tagger.tag(tree, rules)
    val byPath = out.select("path", "tags").distinct().collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap

    // downward: a.b.c inherits bee from a.b. and roots from a.
    assert(byPath("a.b.c") == Set("roots", "bee", "leafc"))
    // upward one-hop: a.b. gets leafc from its direct child a.b.c
    assert(byPath("a.b.") == Set("roots", "bee", "leafc"))
    // upward does NOT jump two levels: a. gets bee (from child a.b.)
    // but not leafc (grandchild a.b.c)
    assert(byPath("a.") == Set("roots", "bee"))
    assert(byPath("a.other") == Set("roots"))

    // row shape: one row per (path, tag), tag1 ∈ tags, is_leaf decoded
    val rows = out.where(col("path") === "a.b.c").collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Boolean]("is_leaf")))
    val nonLeaf = out.where(col("path") === "a.b.").collect()
    assert(nonLeaf.forall(!_.getAs[Boolean]("is_leaf")))
  }

  test("empty regexp matches everything; contains selector") {
    import spark.implicits._
    val tree = Seq("x.y", "z.w")
      .map(p => (p, java.sql.Date.valueOf("2024-01-01"), 1L))
      .toDF("path", "date", "version")
    val out = Tagger.tag(tree, List(
      Tagger.Rule(List("all")),
      Tagger.Rule(List("hasy"), contains = "y")))
    val byPath = out.select("path", "tags").distinct().collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(byPath("x.y") == Set("all", "hasy"))
    assert(byPath("z.w") == Set("all"))
  }
}
