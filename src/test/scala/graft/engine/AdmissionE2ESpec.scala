package graft.engine

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model.FeatureFlags
import graft.streaming.Ingest

/** e2e reproduction of `tests/wildcard_min_distance/test.toml` and
  * `tests/tags_min_in_query/test.toml`: admission control rejects
  * too-costly queries before any scan runs.
  */
class AdmissionE2ESpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val rnow = 1704067200L

  private lazy val tables: String = {
    val dir = Files.createTempDirectory("graft-adm").toFile.getAbsolutePath
    import spark.implicits._
    val lines = (Seq(
      "team_one.prod.test.metric_one",
      "team_two.stage.test.metric_one",
      "team_one.dev.test.metric_two",
      "team_one.dev.nontest.metric_one",
      "test;env=prod", "test;env=dev", "test;env=stage")
      .map(n => s"$n 1.0 ${rnow - 10}")).toDF("value")
    Ingest.processBatch(Ingest.parseLines(lines), s"$dir/t")
    s"$dir/t"
  }

  private def index = spark.read.parquet(s"$tables/index")
  private def tagsTable = spark.read.parquet(s"$tables/tags")

  test("wildcard-min-distance = 1: flank-hugging wildcards rejected") {
    def paths(q: String): Set[String] =
      Finder.find(index, q, wildcardMinDistance = 1)
        .collect().map(_.getString(0)).toSet
    // accepted: exact + single-flank wildcard
    assert(paths("team_one.prod.test.metric_one") == Set("team_one.prod.test.metric_one"))
    assert(paths("*.dev.test.metric_two") == Set("team_one.dev.test.metric_two"))
    // rejected: wildcards hugging both flanks
    Seq("*.prod.test.*", "*.*.test.*", "*.*.*.*", "*.*").foreach { q =>
      val e = intercept[IllegalArgumentException](Finder.find(index, q, wildcardMinDistance = 1))
      assert(e.getMessage.contains("wildcards way too early"), q)
    }
  }

  test("tags-min-in-autocomplete gate") {
    val flags = FeatureFlags(useCarbonBehavior = true)
    assert(Autocomplete.checkTagsMinInAutocomplete(List("env=prod"), 1, flags).isRight)
    assert(Autocomplete.checkTagsMinInAutocomplete(List("env=~pr"), 1, flags).isLeft)
    assert(Autocomplete.checkTagsMinInAutocomplete(List("env="), 1, flags).isLeft)
    assert(Autocomplete.checkTagsMinInAutocomplete(Nil, 0, flags).isRight)
  }

  test("tags-min-in-query = 1 (carbon behaviour): all-costly terms rejected") {
    val flags = FeatureFlags(useCarbonBehavior = true)
    def find(expr: String): Set[String] =
      Finder.findTagged(tagsTable, expr, flags, tagsMinInQuery = 1)
        .collect().map(_.getString(0)).toSet
    assert(find("seriesByTag('name=test')") ==
      Set("test?env=prod", "test?env=dev", "test?env=stage"))
    assert(find("seriesByTag('env=dev')") == Set("test?env=dev"))
    Seq("'env='", "'env!=prod'", "'env!='", "'env=~'", "'env=~pr'", "'env!=~'", "'env!=~pr'")
      .foreach { t =>
        val e = intercept[IllegalArgumentException](
          Finder.findTagged(tagsTable, s"seriesByTag($t)", flags, tagsMinInQuery = 1))
        assert(e.getMessage.contains("too much wildcard"), t)
      }
  }
}
