package graft.e2e

import java.nio.file.{Files, Path, Paths}
import java.time.{Duration, Instant, ZoneId}
import scala.jdk.CollectionConverters._

import graft.engine.{Guards, Limiter}
import graft.model.FeatureFlags
import graft.time.TimeGrammar

import Toml.ValueOps

/** Typed model of one reference e2e scenario
  * (`cmd/e2e-test/e2etesting.go:32-156`): the inputs, the expected
  * find/tags/render results, and the engine knobs extracted from the
  * scenario's graphite-clickhouse config template(s).
  *
  * Raw time strings stay unresolved here; the runner resolves them
  * against a fixed `now` with the scenario precision via
  * [[graft.time.TimeGrammar]] exactly like the reference runner
  * resolves them with `datetime.DateParamToEpoch`.
  */
object Fixture {

  final case class FPoint(value: Double, time: String)
  final case class FInput(name: String, points: Seq[FPoint])

  final case class FindExp(path: String, isLeaf: Boolean)
  final case class FindCheck(
      name: String,
      query: String,
      from: String,
      until: String,
      errorRegexp: String,
      cacheTtl: Int,
      inCache: Boolean,
      proxyDelayMs: Long,
      result: Seq[FindExp])

  final case class TagsCheck(
      name: String,
      names: Boolean, // tag-name vs tag-value autocomplete
      query: String,
      limits: Long,
      errorRegexp: String,
      cacheTtl: Int,
      inCache: Boolean,
      proxyDelayMs: Long,
      result: Seq[String])

  final case class SeriesExp(
      name: String,
      path: Option[String],
      consolidation: Option[String],
      start: String,
      stop: String,
      step: Long,
      reqStart: Option[String],
      reqStop: Option[String],
      values: Seq[Double])

  final case class RenderCheck(
      name: String,
      from: String,
      until: String,
      targets: Seq[String],
      maxDataPoints: Long,
      filteringFunctions: Seq[String],
      optimize: Boolean,
      errorRegexp: String,
      cacheTtl: Int,
      inCache: Boolean,
      proxyDelayMs: Long,
      result: Seq[SeriesExp])

  /** Engine knobs scraped from a `graphite-clickhouse*.conf.tpl`
    * (the reference's full config grammar is `config/config.go`; only
    * the flags the fixture matrix varies are read).
    */
  final case class GchConfig(
      label: String,
      internalAggregation: Boolean = false,
      appendEmptySeries: Boolean = false,
      wildcardMinDistance: Int = 0,
      tagsMinInQuery: Int = 0,
      flags: FeatureFlags = FeatureFlags(),
      findCache: Boolean = false,
      findCacheDefaultTimeout: Int = 0,
      findCacheShortTimeout: Int = 0,
      findCacheShortDuration: Long = 0L,
      findCacheFindTimeout: Int = 0,
      indexTimeoutSec: Long = 0L,
      dataTimeoutSec: Long = 0L,
      defaultLimits: Guards.ReadLimits = Guards.ReadLimits(),
      queryParams: Seq[Guards.QueryParam] = Nil,
      renderMaxQueries: Int = 0,
      renderConcurrent: Int = 0,
      renderAdaptive: Int = 0,
      findMaxQueries: Int = 0,
      findConcurrent: Int = 0,
      findAdaptive: Int = 0,
      tagsMaxQueries: Int = 0,
      tagsConcurrent: Int = 0,
      tagsAdaptive: Int = 0,
      // the template declares a [clickhouse.tls] cert block — the
      // scenario expects its server driven over TLS
      tls: Boolean = false) {

    /** The find/tags limiters (`config.go:749-757`, with the
      * concurrent-above-max normalization of `config.go:739-745`) and
      * the render default-band limiter (`config.go:625-631` — the
      * reference prepends the default band WITHOUT that normalization).
      */
    def findLimiter(loadAvg: () => Double): Limiter.ServerLimiter =
      Limiter(findMaxQueries,
        Limiter.normalizedConcurrent(findMaxQueries, findConcurrent),
        findAdaptive, loadAvg)
    def tagsLimiter(loadAvg: () => Double): Limiter.ServerLimiter =
      Limiter(tagsMaxQueries,
        Limiter.normalizedConcurrent(tagsMaxQueries, tagsConcurrent),
        tagsAdaptive, loadAvg)
    def renderLimiter(loadAvg: () => Double): Limiter.ServerLimiter =
      Limiter(renderMaxQueries, renderConcurrent, renderAdaptive, loadAvg)

    /** The runtime band list (`config.go:625-631`): default band from
      * the base url/data-timeout + the declared `query-params`.
      */
    def bands: IndexedSeq[Guards.QueryParam] =
      Guards.withDefault(
        Guards.QueryParam(0L, dataTimeoutSec, defaultLimits),
        // a band without its own data-timeout inherits the base one
        // (`config.go:611-613`)
        queryParams.map(q =>
          if (q.dataTimeoutSec == 0) q.copy(dataTimeoutSec = dataTimeoutSec) else q))
  }

  final case class Scenario(
      dir: String,
      precision: Long,
      inputs: Seq[FInput],
      findChecks: Seq[FindCheck],
      tagsChecks: Seq[TagsCheck],
      renderChecks: Seq[RenderCheck],
      configs: Seq[GchConfig])

  /** Resolve one fixture time string (`"rnow-30"`, `"midnight+60s"`,
    * epoch literals) the way the reference runner does
    * (`e2etesting.go:642` → `datetime.DateParamToEpoch`).
    */
  def resolveTime(s: String, now: Instant, precisionSec: Long, tz: ZoneId): Long =
    if (s == null || s.isEmpty) 0L
    else TimeGrammar.parse(s, tz, now, Duration.ofSeconds(precisionSec))

  def load(dir: Path): Scenario = {
    val toml = Toml.parse(Files.readString(dir.resolve("test.toml")))
    val test = toml("test")

    val precision = durationSeconds(test.getStr("precision", "0s"))

    val inputs = test.getArr("input").map { in =>
      FInput(
        in.getStr("name"),
        in.getArr("points").map(p => FPoint(p("value").num, p("time") match {
          case Toml.TStr(t) => t
          case other        => other.int.toString
        })))
    }

    val findChecks = test.getArr("find_checks").map { c =>
      FindCheck(
        name = c.getStr("name"),
        query = c.getStr("query"),
        from = c.getStr("from"),
        until = c.getStr("until"),
        errorRegexp = c.getStr("error_regexp"),
        cacheTtl = c.getInt("cache_ttl").toInt,
        inCache = c.get("in_cache").exists(_.bool),
        proxyDelayMs = durationMillis(c.getStr("proxy_delay")),
        result = c.getArr("result").map(r =>
          FindExp(r.getStr("path"), r.get("is_leaf").exists(_.bool))))
    }

    val tagsChecks = test.getArr("tags_checks").map { c =>
      TagsCheck(
        name = c.getStr("name"),
        names = c.get("names").exists(_.bool),
        query = c.getStr("query"),
        limits = c.getInt("limits"),
        errorRegexp = c.getStr("error_regexp"),
        cacheTtl = c.getInt("cache_ttl").toInt,
        inCache = c.get("in_cache").exists(_.bool),
        proxyDelayMs = durationMillis(c.getStr("proxy_delay")),
        result = c.getArr("result").map(_.str))
    }

    val renderChecks = test.getArr("render_checks").map { c =>
      RenderCheck(
        name = c.getStr("name"),
        from = c.getStr("from"),
        until = c.getStr("until"),
        targets = c.getArr("targets").map(_.str),
        maxDataPoints = c.getInt("max_data_points"),
        filteringFunctions = c.getArr("filtering_functions").map(_.str),
        optimize = c.getArr("optimize").nonEmpty,
        errorRegexp = c.getStr("error_regexp"),
        cacheTtl = c.getInt("cache_ttl").toInt,
        inCache = c.get("in_cache").exists(_.bool),
        proxyDelayMs = durationMillis(c.getStr("proxy_delay")),
        result = c.getArr("result").map { r =>
          SeriesExp(
            name = r.getStr("name"),
            path = r.get("path").map(_.str),
            consolidation = r.get("consolidation").map(_.str),
            start = r.getStr("start"),
            stop = r.getStr("stop"),
            step = r.getInt("step"),
            reqStart = r.get("req_start").map(_.str),
            reqStop = r.get("req_stop").map(_.str),
            values = r.getArr("values").map(_.num))
        })
    }

    val configs = test.getArr("graphite_clickhouse").map { g =>
      val tpl = g.getStr("template")
      parseConfTpl(tpl, Files.readString(dir.resolve(tpl)))
    }

    Scenario(dir.getFileName.toString, precision, inputs, findChecks,
      tagsChecks, renderChecks, configs)
  }

  def loadFromTestsRoot(testsRoot: String, scenario: String): Scenario =
    load(Paths.get(testsRoot, scenario))

  /** `"10s"`/`"240s"`/`"2m30s"` → seconds. */
  def durationSeconds(s: String): Long =
    if (s.isEmpty) 0L
    else TimeGrammar.intervalSeconds(s, 1).getOrElse(0L)

  /** `"1500ms"` → 1500; coarser units go through [[durationSeconds]]. */
  def durationMillis(s: String): Long =
    if (s.isEmpty) 0L
    else if (s.endsWith("ms")) s.stripSuffix("ms").trim.toLong
    else durationSeconds(s) * 1000L

  /** Line-scan the knobs this harness honors out of a
    * graphite-clickhouse config template. The templates are TOML too,
    * but flat key scanning is enough (and robust to the `{{ .VAR }}`
    * go-template placeholders).
    */
  def parseConfTpl(label: String, text: String): GchConfig = {
    var c = GchConfig(label = label)
    var section = ""
    // `query-params = [ { … }, … ]` spans lines (an array of inline
    // tables, as the reference templates write it) — collect the block
    // verbatim and split it into entries afterwards, so its inner
    // `url =` lines don't collide with the flat `[clickhouse] url` key.
    var inQueryParams = false
    val qpBuf = new StringBuilder
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (inQueryParams) {
        if (line == "]") {
          inQueryParams = false
          c = c.copy(queryParams = parseQueryParams(qpBuf.toString()))
        } else qpBuf.append(line).append('\n')
      }
      else if (section == "clickhouse" && line.startsWith("query-params") && line.endsWith("["))
        inQueryParams = true
      else if (line.startsWith("[")) {
        section = line.stripPrefix("[").takeWhile(_ != ']')
        if (section == "clickhouse.tls") c = c.copy(tls = true)
      }
      else line.split("=", 2) match {
        case Array(k0, v0) =>
          val k = k0.trim
          val v = v0.trim.stripPrefix("\"").stripSuffix("\"")
          (section, k) match {
            case ("clickhouse", "url") =>
              c = c.copy(defaultLimits = Guards.ReadLimits.fromUrl(v))
            case ("clickhouse", "data-timeout") =>
              c = c.copy(dataTimeoutSec = durationSeconds(v))
            case ("clickhouse", "index-timeout") =>
              c = c.copy(indexTimeoutSec = durationSeconds(v))
            case ("clickhouse", "internal-aggregation") =>
              c = c.copy(internalAggregation = v == "true")
            case ("common", "append-empty-series") | ("clickhouse", "append-empty-series") =>
              c = c.copy(appendEmptySeries = v == "true")
            case ("clickhouse", "wildcard-min-distance") | ("common", "wildcard-min-distance") =>
              c = c.copy(wildcardMinDistance = v.toInt)
            case ("clickhouse", "tags-min-in-query") | ("common", "tags-min-in-query") =>
              c = c.copy(tagsMinInQuery = v.toInt)
            // limiter knobs (`config.go:216-228`). The templates/doc
            // spell the concurrency cap both "-max-concurrent"
            // (tests/limiter*, doc/config.md:115-119) and
            // "-concurrent-queries" (the struct tags); accept both.
            case ("clickhouse", "render-max-queries") =>
              c = c.copy(renderMaxQueries = v.toInt)
            case ("clickhouse", "render-max-concurrent") | ("clickhouse", "render-concurrent-queries") =>
              c = c.copy(renderConcurrent = v.toInt)
            case ("clickhouse", "render-adaptive-queries") =>
              c = c.copy(renderAdaptive = v.toInt)
            case ("clickhouse", "find-max-queries") =>
              c = c.copy(findMaxQueries = v.toInt)
            case ("clickhouse", "find-max-concurrent") | ("clickhouse", "find-concurrent-queries") =>
              c = c.copy(findConcurrent = v.toInt)
            case ("clickhouse", "find-adaptive-queries") =>
              c = c.copy(findAdaptive = v.toInt)
            case ("clickhouse", "tags-max-queries") =>
              c = c.copy(tagsMaxQueries = v.toInt)
            case ("clickhouse", "tags-max-concurrent") | ("clickhouse", "tags-concurrent-queries") =>
              c = c.copy(tagsConcurrent = v.toInt)
            case ("clickhouse", "tags-adaptive-queries") =>
              c = c.copy(tagsAdaptive = v.toInt)
            case ("feature-flags", "use-carbon-behaviour") =>
              c = c.copy(flags = c.flags.copy(useCarbonBehavior = v == "true"))
            case ("feature-flags", "dont-match-missing-tags") =>
              c = c.copy(flags = c.flags.copy(dontMatchMissingTags = v == "true"))
            case ("common.find-cache", "default-timeout") =>
              c = c.copy(findCache = true, findCacheDefaultTimeout = v.toInt)
            case ("common.find-cache", "short-timeout") =>
              c = c.copy(findCache = true, findCacheShortTimeout = v.toInt)
            case ("common.find-cache", "short-duration") =>
              c = c.copy(findCache = true, findCacheShortDuration = durationSeconds(v))
            case ("common.find-cache", "find-timeout") =>
              c = c.copy(findCache = true, findCacheFindTimeout = v.toInt)
            case _ =>
          }
        case _ =>
      }
    }
    c
  }

  /** Split a collected `query-params` block into bands: one `{ … }`
    * inline table each, with `duration`, `url` (read limits) and an
    * optional `data-timeout` (0 here = inherit the base, resolved in
    * [[GchConfig.bands]]).
    */
  private def parseQueryParams(block: String): Seq[Guards.QueryParam] = {
    def field(entry: String, key: String): Option[String] =
      ("""(?m)^\s*""" + java.util.regex.Pattern.quote(key) + """\s*=\s*"([^"]*)"""").r
        .findFirstMatchIn(entry).map(_.group(1))
    // the reference templates embed go-template placeholders
    // (`{{ .PROXY_URL }}` in tests/error_handling) whose `}}` would
    // otherwise terminate an entry mid-url — drop them first; the
    // read-limit params live in the url's query string, not the host.
    val cleaned = block.replaceAll("""\{\{[^{}]*\}\}""", "")
    // a chunk between '}'s that carries no `key = "value"` line is
    // inter-entry punctuation (the ',' and '{' separators), not a band
    cleaned.split("\\}").toSeq.map(_.trim).filter(_.contains("=")).map { entry =>
      Guards.QueryParam(
        durationSec = durationSeconds(field(entry, "duration").getOrElse("")),
        dataTimeoutSec = durationSeconds(field(entry, "data-timeout").getOrElse("")),
        limits = field(entry, "url").map(Guards.ReadLimits.fromUrl).getOrElse(Guards.ReadLimits()))
    }
  }
}
