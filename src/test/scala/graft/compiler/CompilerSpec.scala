package graft.compiler

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model.FeatureFlags

class GlobCompilerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val paths = Seq(
    "test.plain1", "test.plain2", "test2.plain", "test.plain1.sub",
    "other.metric", "test.", "test2.", "testX.plain"
  ).toDF("path")

  private def select(glob: String, tree: Boolean = false): Set[String] = {
    val pred = GlobCompiler.glob(col("path"), glob, optionalDotAtEnd = tree)
    paths.where(pred).as[String].collect().toSet
  }

  test("star matches everything") {
    assert(select("*") == paths.as[String].collect().toSet)
  }

  test("exact match") {
    assert(select("test.plain1") == Set("test.plain1"))
    assert(select("test.plain1", tree = true) == Set("test.plain1"))
    assert(select("test", tree = true) == Set("test."))
  }

  test("prefix glob is a loose prefix fast path (level filter tightens it)") {
    // trailing-* globs compile to a bare prefix match, deliberately
    // crossing dots: the finder's Level = depth predicate restores
    // exact node-count semantics (finder/index.go:69-78)
    assert(select("test.plain*") == Set("test.plain1", "test.plain2", "test.plain1.sub"))
    assert(select("test*") == Set("test.plain1", "test.plain2", "test2.plain",
      "test.plain1.sub", "test.", "test2.", "testX.plain"))
  }

  test("prefix glob combined with level predicate gives exact semantics") {
    import org.apache.spark.sql.functions.{size, split}
    val withLevel = paths.withColumn("level", size(split(col("path"), "\\.")))
    val got = withLevel
      .where(GlobCompiler.glob(col("path"), "test.plain*") && col("level") === 2)
      .select("path").as[String].collect().toSet
    assert(got == Set("test.plain1", "test.plain2"))
  }

  test("wildcard within node does not cross dots (non-trailing forms)") {
    assert(select("*.plain") == Set("test2.plain", "testX.plain"))
    assert(select("test?.plain") == Set("test2.plain", "testX.plain"))
    assert(select("test.*1") == Set("test.plain1"))
  }

  test("brace alternation") {
    assert(select("test{1,2}.plain") == Set("test2.plain"))
    assert(select("{test,test2}.plain*") == Set("test.plain1", "test.plain2", "test2.plain"))
  }

  test("one-element group cleanup applies") {
    assert(select("test.plain[1]") == Set("test.plain1"))
    assert(select("te{s}t.plain1") == Set("test.plain1"))
  }

  test("character class") {
    assert(select("test.plain[12]") == Set("test.plain1", "test.plain2"))
  }
}

class TaggedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("seriesByTag arg parsing") {
    assert(Tagged.seriesByTagArgs("seriesByTag('a=b', 'c=~d.*')") ==
      Right(List("a=b", "c=~d.*")))
    assert(Tagged.seriesByTagArgs("""seriesByTag("x!=y")""") == Right(List("x!=y")))
    assert(Tagged.seriesByTagArgs("notSeriesByTag('a=b')").isLeft)
    assert(Tagged.seriesByTagArgs("seriesByTag('a=b'").isLeft)
  }

  test("term parsing: ops, name alias, wildcard detect") {
    val Right(terms) = Tagged.parseConditions(
      List("name=cpu.load", "env!=prod", "dc=~west.*", "host!=~web\\d+", "role=front*")): @unchecked
    assert(terms(0) == Tagged.Term("__name__", Tagged.Op.Eq, "cpu.load"))
    assert(terms(1) == Tagged.Term("env", Tagged.Op.Ne, "prod"))
    assert(terms(2) == Tagged.Term("dc", Tagged.Op.Match, "west.*"))
    assert(terms(3) == Tagged.Term("host", Tagged.Op.NotMatch, "web\\d+"))
    assert(terms(4).hasWildcard)
  }

  test("term ordering puts exact eq and __name__ first") {
    val Right(terms) = Tagged.parseConditions(
      List("dc=~west.*", "role=front*", "env=prod", "name=cpu")): @unchecked
    val sorted = Tagged.sortTerms(terms)
    assert(sorted.map(_.key) == List("__name__", "env", "role", "dc"))
  }

  // tags table fixture: storage form path + tags array
  private lazy val tagsDf = Seq(
    ("metric1?tag1=value1&tag2=value21", Seq("__name__=metric1", "tag1=value1", "tag2=value21")),
    ("metric1?tag2=value22", Seq("__name__=metric1", "tag2=value22")),
    ("metric2?tag1=value1", Seq("__name__=metric2", "tag1=value1")),
    ("metric2?tag2=value21&tag3=value3", Seq("__name__=metric2", "tag2=value21", "tag3=value3")),
    ("metric3?tag3=", Seq("__name__=metric3", "tag3="))
  ).toDF("path", "tags")
    // emulate the one-row-per-tag inverted layout: tag1 = each tag
    .withColumn("tag1", org.apache.spark.sql.functions.explode(col("tags")))

  private def find(expr: String, flags: FeatureFlags = FeatureFlags()): Set[String] = {
    val Right(terms) = Tagged.parseSeriesByTag(expr, flags): @unchecked
    val pred = Tagged.wherePredicate(col("tag1"), col("tags"), terms, flags)
    tagsDf.where(pred).select("path").distinct().as[String].collect().toSet
  }

  test("eq on name and tag") {
    assert(find("seriesByTag('name=metric1', 'tag2=value21')") ==
      Set("metric1?tag1=value1&tag2=value21"))
    assert(find("seriesByTag('tag1=value1')") ==
      Set("metric1?tag1=value1&tag2=value21", "metric2?tag1=value1"))
  }

  test("ne excludes matching series") {
    assert(find("seriesByTag('name=metric1', 'tag2!=value21')") ==
      Set("metric1?tag2=value22"))
  }

  test("regex match") {
    assert(find("seriesByTag('tag2=~value2.*')") ==
      Set("metric1?tag1=value1&tag2=value21", "metric1?tag2=value22",
        "metric2?tag2=value21&tag3=value3"))
    assert(find("seriesByTag('name=~metric[12]$', 'tag1=value1')") ==
      Set("metric1?tag1=value1&tag2=value21", "metric2?tag1=value1"))
  }

  test("wildcard eq value") {
    assert(find("seriesByTag('tag2=value2*')") ==
      Set("metric1?tag1=value1&tag2=value21", "metric1?tag2=value22",
        "metric2?tag2=value21&tag3=value3"))
  }

  test("ne empty means tag exists non-empty") {
    assert(find("seriesByTag('tag3!=')") == Set("metric2?tag2=value21&tag3=value3"))
  }

  test("carbon behavior: eq empty means tag absent") {
    val flags = FeatureFlags(useCarbonBehavior = true)
    assert(find("seriesByTag('name=~metric.*', 'tag1=')", flags) ==
      Set("metric1?tag2=value22", "metric2?tag2=value21&tag3=value3", "metric3?tag3="))
  }

  test("dontMatchMissingTags: ne only matches series having the tag") {
    val flags = FeatureFlags(dontMatchMissingTags = true)
    // without the flag, metric2?tag1=value1 (no tag2) matches tag2!=value21
    assert(find("seriesByTag('tag2!=value21')") ==
      Set("metric1?tag2=value22", "metric2?tag1=value1", "metric3?tag3="))
    // with the flag, series lacking tag2 are excluded
    assert(find("seriesByTag('tag2!=value21')", flags) == Set("metric1?tag2=value22"))
  }

  test("path decode to display form") {
    assert(Tagged.decodePath("metric1?tag1=value1&tag2=value21") ==
      "metric1;tag1=value1;tag2=value21")
    assert(Tagged.decodePath("m?b=2&a=1") == "m;a=1;b=2")
    assert(Tagged.decodePath("plain.metric") == "plain.metric")
    assert(Tagged.decodePath("m?minus=%2D&plus=%2B") == "m;minus=-;plus=+")
    assert(Tagged.encodePath("m;a=1;b=2") == "m?a=1&b=2")
  }
}
