package graft.e2e

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Guards

/** Unit coverage for the config-template scraper, independent of the
  * full scenario runner — in particular the `query-params` band block
  * with go-template `{{ .VAR }}` placeholders embedded in the urls, as
  * the reference writes it
  * (`/root/reference/tests/error_handling/graphite-clickhouse.conf.tpl`).
  */
class FixtureSpec extends AnyFunSuite {

  private val tpl =
    """[common]
      |listen = "{{ .GCH_ADDR }}"
      |
      |[clickhouse]
      |url = "{{ .PROXY_URL }}/?max_rows_to_read=500000000&max_result_bytes=1073741824&readonly=2"
      |data-timeout = "1s"
      |
      |query-params = [
      |  {
      |    duration = "1h",
      |    url = "{{ .PROXY_URL }}/?max_rows_to_read=1&max_result_bytes=1&readonly=2",
      |    data-timeout = "5s"
      |  },
      |  {
      |    duration = "7h",
      |    url = "{{ .PROXY_URL }}/?max_memory_usage=1&max_memory_usage_for_user=1&readonly=2"
      |  }
      |]
      |
      |index-timeout = "1s"
      |internal-aggregation = false
      |""".stripMargin

  test("query-params bands survive {{ .VAR }} placeholders in urls") {
    val c = Fixture.parseConfTpl("tpl", tpl)
    assert(c.dataTimeoutSec == 1L)
    assert(c.indexTimeoutSec == 1L)
    assert(c.defaultLimits == Guards.ReadLimits(maxRowsToRead = 500000000L, maxResultBytes = 1073741824L))
    assert(c.queryParams.length == 2)
    assert(c.queryParams(0) == Guards.QueryParam(
      durationSec = 3600L, dataTimeoutSec = 5L,
      limits = Guards.ReadLimits(maxRowsToRead = 1L, maxResultBytes = 1L)))
    // second band has no data-timeout of its own: stays 0 here, inherits
    // the base 1s via GchConfig.bands
    assert(c.queryParams(1) == Guards.QueryParam(
      durationSec = 7L * 3600L, dataTimeoutSec = 0L,
      limits = Guards.ReadLimits(maxMemoryUsage = 1L)))
    val bands = c.bands
    assert(bands.length == 3)
    assert(bands(0).limits == c.defaultLimits)
    assert(bands(2).dataTimeoutSec == 1L)
    // band selection: 30 min window → default; 2 h → band 1; 8 h → band 2
    assert(Guards.select(bands, 1800L) eq bands(0))
    assert(Guards.select(bands, 2L * 3600L) == bands(1))
    assert(Guards.select(bands, 8L * 3600L) == bands(2))
  }

  test("limiter knobs parse in both spellings (tests/limiterwn, doc/config.md)") {
    val c = Fixture.parseConfTpl("tpl",
      """[clickhouse]
        |url = "{{ .CLICKHOUSE_URL }}/?readonly=2"
        |render-max-queries = 100
        |render-max-concurrent = 6
        |render-adaptive-queries = 2
        |find-max-queries = 50
        |find-concurrent-queries = 4
        |tags-max-queries = 50
        |tags-max-concurrent = 4
        |""".stripMargin)
    assert(c.renderMaxQueries == 100 && c.renderConcurrent == 6 && c.renderAdaptive == 2)
    assert(c.findMaxQueries == 50 && c.findConcurrent == 4 && c.findAdaptive == 0)
    assert(c.tagsMaxQueries == 50 && c.tagsConcurrent == 4)
    assert(c.findLimiter(() => 0.0).enabled)
    assert(c.renderLimiter(() => 0.0).enabled)
    // no knobs → Noop
    val none = Fixture.parseConfTpl("tpl", "[clickhouse]\nurl = \"x\"\n")
    assert(!none.findLimiter(() => 0.0).enabled)
  }
}
