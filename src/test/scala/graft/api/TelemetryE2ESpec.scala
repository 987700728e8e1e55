package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.engine.{FindCache, Limiter}
import graft.metrics.Telemetry
import graft.rollup.{AggFunc, Rules}
import graft.streaming.Ingest

/** End-to-end self-telemetry over real HTTP sockets: instrumented
  * routes populate the reference-named counters/histograms, and the
  * dogfood loop — the emitted graphite lines are fed to the engine's
  * own line-protocol ingest and found back through the index — proves
  * the service can be monitored BY ITSELF (the reference emits to a
  * graphite relay whose storage is gra phite-clickhouse again).
  */
class TelemetryE2ESpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val rnow = 1704067200L
  private val now = Instant.ofEpochSecond(rnow + 5)

  private lazy val tablesDir: String = {
    val dir = Files.createTempDirectory("graft-telemetry").toFile.getAbsolutePath
    import spark.implicits._
    val lines = (0 until 4).flatMap { i =>
      Seq(s"test.plain1 ${i + 1.0} ${rnow - 30 + i * 10}",
        s"test.plain2 ${i + 2.0} ${rnow - 30 + i * 10}",
        s"metric1;tag1=value1 ${i + 3.0} ${rnow - 30 + i * 10}")
    }
    Ingest.processBatch(Ingest.parseLines(lines.toDF("value")), s"$dir/t")
    s"$dir/t"
  }

  private def get(api: HttpApi, pathAndQuery: String): HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(api.address + pathAndQuery)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  /** record() runs after the response is written — poll briefly. */
  private def eventually(cond: => Boolean, ms: Long = 5000): Boolean = {
    val deadline = System.nanoTime() + ms * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(20)
    cond
  }

  test("instrumented routes + dogfood ingest of the emitted lines") {
    val cfg = HttpApi.Config(
      rules = Rules(Nil, defaultPrecision = 10L, defaultFunction = Some(AggFunc.Avg)),
      findCache = Some(FindCache.Config(
        defaultTimeoutSec = 60, findTimeoutSec = 60)),
      limits = HttpApi.Limits(
        tags = Limiter(maxQueries = 8, concurrent = 4),
        render = Limiter(maxQueries = 8, concurrent = 4)),
      metrics = Some(Telemetry.MetricsConfig(
        metricEndpoint = "127.0.0.1:1", // flusher interval never fires in-test
        extendedStat = true,
        metricIntervalSec = 3600,
        ranges = Map("1h" -> 3600L, "7d" -> 604800L),
        findRanges = Map("1h" -> 3600L))))
    val api = new HttpApi(spark, tablesDir, cfg, clock = () => now).start()
    try {
      val tm = api.telemetry.get
      def counter(n: String): Long =
        tm.registry.get(n).get.asInstanceOf[Telemetry.Counter].count
      def hist(n: String): Telemetry.DurationHistogram =
        tm.registry.get(n).get.asInstanceOf[Telemetry.DurationHistogram]

      val findQ = s"/metrics/find/?query=test.*&format=json&from=${rnow - 1800}&until=$rnow"
      assert(get(api, findQ).statusCode() == 200)
      assert(get(api, findQ).statusCode() == 200) // second: cache hit
      assert(get(api, "/metrics/find/?format=json").statusCode() == 400) // no query
      assert(get(api,
        s"/render/?target=test.plain1&from=${rnow - 60}&until=$rnow&format=json")
        .statusCode() == 200)
      assert(get(api, "/tags/autoComplete/tags?expr=tag1%3Dvalue1").statusCode() == 200)

      // find scope: 3 requests (2×200 + 400), the 400 is the one error
      assert(eventually(hist("find.all.requests").totalCount == 3))
      assert(counter("find.all.errors") == 1)
      assert(counter("find.all.requests_status_code.200") == 2)
      assert(counter("find.all.requests_status_code.400") == 1)
      // both 200-finds were 1800 s wide → the 1h find-range cell
      assert(hist("find.1h.requests").totalCount >= 2)
      // finder cache pair: find#1 missed, find#2 hit, and the
      // autocomplete miss lands here too (`autocomplete.go:434-435`)
      assert(eventually(counter("find_cache_misses") == 2))
      assert(counter("find_cache_hits") == 1)
      // render scope incl. the finder-phase split and the 1h range cell
      assert(eventually(hist("render.all.requests").totalCount == 1))
      assert(hist("render.all.requests_finder").totalCount == 1)
      assert(hist("render.1h.requests").totalCount == 1)
      // render find-cache (default pair: no short window configured)
      assert(counter("default_cache_misses") == 1)
      // tags scope: the autocomplete round
      assert(eventually(hist("tags.all.requests").totalCount == 1))
      // admission: find+autocomplete enter through the tags limiter
      // (reference quirk, `find/handler.go:50-51`) — the cached second
      // find never admits; render through its own
      assert(counter("tags_wait.all.requests") == 2)
      assert(counter("render_wait.all.requests") == 1)
      assert(counter("find_wait.all.requests") == 0)
      // engine-read accounting: the render scanned the points parquet
      // (query.<table> cells register lazily on first use)
      assert(eventually(tm.registry.get("query.points.all.requests")
        .exists(_.asInstanceOf[Telemetry.DurationHistogram].totalCount == 1)))

      // ---- dogfood: the emitted lines are valid engine input ----
      val lines = tm.renderLines(rnow).split("\n").toSeq.filter(_.nonEmpty)
      assert(lines.nonEmpty)
      import spark.implicits._
      val dogDir = Files.createTempDirectory("graft-dogfood").toFile.getAbsolutePath
      Ingest.processBatch(Ingest.parseLines(lines.toDF("value")), s"$dogDir/t")
      val pts = spark.read.parquet(s"$dogDir/t/points")
      import org.apache.spark.sql.functions.col
      // every line survived the parse (nothing dropped as malformed)
      assert(pts.count() == lines.size.toLong)
      val row = pts.where(col("path") === "graphite.find.all.requests_to_inf")
        .select("value").collect()
      assert(row.length == 1 && row(0).getDouble(0) == 3.0)
      // and the service can FIND its own telemetry through the API
      val selfQ = get(api, "/metrics/find/?query=graphite.find.all.*&format=json&noCache=1")
      // (different store — just proves the path grammar round-trips;
      // the parse above proves the value channel)
      assert(selfQ.statusCode() == 200)
    } finally api.stop()
  }
}
