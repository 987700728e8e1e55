package graft.e2e

import java.nio.file.{Files, Paths}
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Data-driven port of the reference's e2e conformance matrix: each
  * `tests/<dir>/test.toml` is parsed verbatim and every
  * find/tags/render check is executed against the Spark engine under
  * every graphite-clickhouse config variant the scenario declares —
  * the engine-agnostic behavioral spec SURVEY §5 names primary
  * (`cmd/e2e-test/e2etesting.go` is the reference runner).
  *
  * Excluded dirs: `clickhouse` only (storage bootstrap, not a
  * scenario). The `tls` dir replays here engine-wise and over an
  * HTTPS socket in `TomlOverHttpSpec` (JVM keystore standing in for
  * the reference's cert files). The `limiter{a,max,w,wn}` dirs replay with their
  * admission limiters built and engaged per check
  * ([[FixtureRunner.Limiters]]); saturation refusals themselves are
  * covered deterministically by `LimiterSpec`.
  */
class TomlFixtureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val testsRoot = "/root/reference/tests"

  // a fixed "wall clock": 2024-01-01 12:00:05 UTC → rnow = 12:00:00.
  // Mid-day, like the real runner's wall clock — `find_cache` renders
  // a [midnight-270s, midnight] window and expects the `now` point to
  // fall outside it.
  private val now = Instant.ofEpochSecond(1704110405L)

  private val scenarios = Seq(
    "one_table",
    "agg_internal",
    "agg_latest",
    "agg_merge",
    "agg_oneblock",
    "emptyseries_append",
    "emptyseries_noappend",
    "consolidateBy",
    "feature_flags_both_true",
    "feature_flags_false",
    "feature_flags_use_carbon_behaviour",
    "feature_flags_dont_match_missing_tags",
    "wildcard_min_distance",
    "tags_min_in_query",
    "find_cache",
    "limitera",
    "limitermax",
    "limiterw",
    "limiterwn",
    // the TLS scenario's checks are the one_table family plus the
    // midnight/day-end date-boundary cases; the HTTPS transport leg
    // runs in TomlOverHttpSpec
    "tls",
    // last: its 1 s index/data timeouts assume a warm session (the
    // reference harness likewise runs it against a long-lived server)
    "error_handling")

  for (dir <- scenarios) {
    val path = Paths.get(testsRoot, dir)
    if (Files.isRegularFile(path.resolve("test.toml"))) {
      val scenario = Fixture.load(path)
      // one ingest per scenario, shared by its config-variant tests.
      // timeScale = 4: under the full parallel suite, real compute can
      // eat a reference 1 s data-timeout that assumed a dedicated
      // server; scaling timeouts AND proxy delays together keeps every
      // 504-vs-success expectation deterministic (see ScenarioRun doc).
      lazy val run = new FixtureRunner.ScenarioRun(spark, scenario, now, timeScale = 4L)
      for (conf <- scenario.configs) {
        test(s"$dir [${conf.label}]") {
          val errors = run.run(conf)
          assert(errors.isEmpty, errors.mkString("\n", "\n", ""))
        }
      }
    } else {
      ignore(s"$dir (fixture not present)") {}
    }
  }
}
