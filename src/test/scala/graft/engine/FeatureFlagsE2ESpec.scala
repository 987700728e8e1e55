package graft.engine

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model.FeatureFlags
import graft.streaming.Ingest

/** e2e reproduction of `tests/feature_flags_both_true/test.toml`:
  * `use-carbon-behaviour` + `dont-match-missing-tags` semantics for
  * empty-value and missing-tag terms, end to end through ingest and
  * the tagged finder.
  */
class FeatureFlagsE2ESpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val flags = FeatureFlags(useCarbonBehavior = true, dontMatchMissingTags = true)

  private val rnow = 1704067200L

  private lazy val tagsTable = {
    val dir = Files.createTempDirectory("graft-ff").toFile.getAbsolutePath
    import spark.implicits._
    val names = Seq(
      "request_success_total.counter;app=test;project=Test;environment=TEST",
      "request_success_total.counter;app=test;project=Test;environment=TEST;t=q",
      "request_success_total.counter;app=test;project=Test;environment=TEST;t=qac",
      "request_success_total.counter;app=test;project=Test;environment=TEST;t=cqa",
      "test;env=prod",
      "test;env=dr")
    val lines = names.map(n => s"$n 1.0 ${rnow - 10}").toDF("value")
    Ingest.processBatch(Ingest.parseLines(lines), s"$dir/t")
    spark.read.parquet(s"$dir/t/tags")
  }

  private def display(storage: String): String =
    storage.replace("?", ";").replace("&", ";")

  private def find(expr: String): Set[String] =
    Finder.findTagged(tagsTable, expr, flags)
      .collect().map(r => display(r.getString(0))).toSet

  private val base = "request_success_total.counter;app=test;environment=TEST;project=Test"

  test("plain tagged find matches all four request series") {
    assert(find("seriesByTag('name=request_success_total.counter', 'app=test', 'project=Test', 'environment=TEST')") ==
      Set(base, s"$base;t=q", s"$base;t=qac", s"$base;t=cqa"))
  }

  test("carbon behaviour: 't=' selects series WITHOUT the tag") {
    assert(find("seriesByTag('name=request_success_total.counter', 'app=test', 'project=Test', 'environment=TEST', 't=')") ==
      Set(base))
    assert(find("seriesByTag('t=')") ==
      Set(base, "test;env=dr", "test;env=prod"))
  }

  test("'t!=' selects series WITH a non-empty t") {
    assert(find("seriesByTag('name=request_success_total.counter', 'app=test', 'project=Test', 'environment=TEST', 't!=')") ==
      Set(s"$base;t=q", s"$base;t=qac", s"$base;t=cqa"))
  }

  test("dont-match-missing-tags: '!=' on an absent tag matches nothing") {
    assert(find("seriesByTag('dc!=ru')") == Set.empty[String])
  }
}
