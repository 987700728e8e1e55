package graft.metrics

import org.scalatest.funsuite.AnyFunSuite

import graft.metrics.Telemetry._

/** Reference vectors from `metrics/metrics_test.go` (registered metric
  * names, bucket-label fill, range resolution) plus the send-dispatch
  * and emission contracts of `metrics/metrics.go` /
  * `metrics/query_metrics.go`.
  */
class TelemetrySpec extends AnyFunSuite {

  // ---------------------------------------------------------------
  // bucket labels (`metrics_test.go` "labels (all)"/"(part)"/"(default)")
  // ---------------------------------------------------------------

  test("default buckets and generated labels") {
    assert(DefaultBuckets == Seq(200L, 500, 1000, 2000, 3000, 5000, 7000,
      10000, 15000, 20000, 25000, 30000, 40000, 50000, 60000))
    assert(resolveLabels(DefaultBuckets, Nil) == Seq(
      "_to_200ms", "_to_500ms", "_to_1000ms", "_to_2000ms", "_to_3000ms",
      "_to_5000ms", "_to_7000ms", "_to_10000ms", "_to_15000ms", "_to_20000ms",
      "_to_25000ms", "_to_30000ms", "_to_40000ms", "_to_50000ms", "_to_60000ms",
      "_to_inf"))
  }

  test("configured labels win; missing tail label becomes _to_inf") {
    val w = Seq(200L, 500, 1000, 2000, 3000)
    // "labels (all)": a full set incl. a custom overflow label sticks
    val full = Seq("_to_200ms", "_to_500ms", "_to_1000ms", "_to_2000ms",
      "_to_3000ms", "_to_last")
    assert(resolveLabels(w, full) == full)
    // "labels (part)": one short — overflow falls back to _to_inf
    assert(resolveLabels(w, full.init) == full.init :+ "_to_inf")
    // empty strings fall back positionally
    assert(resolveLabels(w, Seq("", "_b")) ==
      Seq("_to_200ms", "_b", "_to_1000ms", "_to_2000ms", "_to_3000ms", "_to_inf"))
  }

  // ---------------------------------------------------------------
  // range resolution (`metrics_test.go` "labels (default)" / "ranges")
  // ---------------------------------------------------------------

  private val hourRanges = Map(
    "1h" -> 3600L, "3d" -> 259200L, "7d" -> 604800L,
    "30d" -> 2592000L, "90d" -> 7776000L)

  test("ranges sort ascending and append history when nothing unbounded") {
    val (names, bounds) = resolveRanges(hourRanges)
    assert(names == Seq("1h", "3d", "7d", "30d", "90d", "history"))
    assert(bounds == Seq(3600L, 259200L, 604800L, 2592000L, 7776000L, Long.MaxValue))
  }

  test("a non-positive range is unbounded, keeps its name, sorts last") {
    val (names, bounds) = resolveRanges(hourRanges + ("last" -> 0L))
    assert(names == Seq("1h", "3d", "7d", "30d", "90d", "last"))
    assert(bounds.last == Long.MaxValue)
  }

  test("searchLe picks the first admitting range") {
    val bounds = Seq(3600L, 259200L, Long.MaxValue)
    assert(searchLe(bounds, 1800L) == 0)
    assert(searchLe(bounds, 3600L) == 0) // inclusive upper bound
    assert(searchLe(bounds, 3601L) == 1)
    assert(searchLe(bounds, 999999999L) == 2)
    assert(searchLe(Nil, 5L) == -1)
  }

  // ---------------------------------------------------------------
  // registered names (`metrics_test.go` compareInterface checks)
  // ---------------------------------------------------------------

  test("base registry names match the reference (no extended stat)") {
    val s = new Service(MetricsConfig(metricEndpoint = "127.0.0.1:2003"))
    val names = s.registry.names.toSet
    val expected = Set(
      "find_cache_hits", "find_cache_misses",
      "short_cache_hits", "short_cache_misses",
      "default_cache_hits", "default_cache_misses",
      "find.all.requests", "find.all.errors",
      "tags.all.requests", "tags.all.errors",
      "render.all.requests", "render.all.requests_finder", "render.all.errors",
      "find_wait.all.requests", "find_wait.all.errors",
      "tags_wait.all.requests", "tags_wait.all.errors",
      "render_wait.all.requests", "render_wait.all.errors")
    assert(expected.subsetOf(names))
    // no status-code counters without extended-stat (`metrics.go:161-181`)
    assert(!names.exists(_.contains("requests_status_code")))
  }

  test("extended-stat registers the status-code counter family") {
    val s = new Service(MetricsConfig(metricEndpoint = "127.0.0.1:2003",
      extendedStat = true))
    val names = s.registry.names.toSet
    for (scope <- Seq("find", "tags", "render");
         code <- Seq("200", "400", "403", "404", "4xx", "500", "503", "504", "5xx"))
      assert(names.contains(s"$scope.all.requests_status_code.$code"),
        s"$scope/$code")
  }

  test("ranges register per-range cells for render, find-ranges for find/tags") {
    val s = new Service(MetricsConfig(metricEndpoint = "127.0.0.1:2003",
      ranges = hourRanges, findRanges = Map("1h" -> 3600L, "last" -> 0L)))
    val names = s.registry.names.toSet
    for (r <- Seq("1h", "3d", "7d", "30d", "90d", "history")) {
      assert(names.contains(s"render.$r.requests"))
      assert(names.contains(s"render.$r.requests_finder"))
      assert(names.contains(s"render.$r.errors"))
    }
    for (r <- Seq("1h", "last"); sc <- Seq("find", "tags")) {
      assert(names.contains(s"$sc.$r.requests"))
      assert(names.contains(s"$sc.$r.errors"))
    }
    // render ranges don't leak into find and vice versa
    assert(!names.contains("find.90d.requests"))
    assert(!names.contains("render.last.requests"))
  }

  test("query metrics register lazily per table with range cells") {
    val s = new Service(MetricsConfig(metricEndpoint = "127.0.0.1:2003",
      ranges = Map("1h" -> 3600L)))
    s.query("points")
    s.query("") // "" → "default" (`query_metrics.go:35-37`)
    val names = s.registry.names.toSet
    for (t <- Seq("points", "default"); r <- Seq("all", "1h", "history")) {
      assert(names.contains(s"query.$t.$r.requests"), s"$t/$r")
      assert(names.contains(s"query.$t.$r.errors"), s"$t/$r")
    }
    // registering twice is idempotent
    assert(s.query("points") eq s.query("points"))
  }

  // ---------------------------------------------------------------
  // send dispatch (`SendFindMetrics`/`SendRenderMetrics`)
  // ---------------------------------------------------------------

  test("status dispatch: 200/404 succeed and sample sizes, others error") {
    val s = new Service(MetricsConfig(metricEndpoint = "127.0.0.1:2003",
      extendedStat = true, findRanges = Map("1h" -> 3600L)))
    val sink = new CollectingStat
    s.find.send(200, 50, 1800, sink, metricsCount = 7)
    s.find.send(404, 10, 1800, sink, metricsCount = 0)
    s.find.send(400, 10, 1800, sink, metricsCount = 0)
    s.find.send(503, 10, 999999L, sink, metricsCount = 0)
    s.find.send(599, 10, 1800, sink, metricsCount = 0)
    s.find.send(418, 10, 1800, sink, metricsCount = 0)

    def counter(n: String): Long =
      s.registry.get(n).get.asInstanceOf[Counter].count
    assert(counter("find.all.errors") == 4) // 400 + 503 + 599 + 418
    assert(counter("find.all.requests_status_code.200") == 1)
    assert(counter("find.all.requests_status_code.404") == 1)
    assert(counter("find.all.requests_status_code.400") == 1)
    assert(counter("find.all.requests_status_code.503") == 1)
    assert(counter("find.all.requests_status_code.5xx") == 1)
    assert(counter("find.all.requests_status_code.4xx") == 1)
    // range attribution: everything but the 503 fell in the 1h cell
    assert(counter("find.1h.errors") == 3)
    assert(counter("find.history.errors") == 1)
    // size samples only on success (`metrics.go:353-360,385-392`)
    assert(sink.values("find.all.metrics") == Seq(7L, 0L))
    assert(sink.values("find.1h.metrics") == Seq(7L, 0L))
  }

  test("render send records the finder split and points sample") {
    val s = new Service(MetricsConfig(metricEndpoint = "127.0.0.1:2003",
      extendedStat = true))
    val sink = new CollectingStat
    s.render.send(200, 1500, 3600, sink, metricsCount = 12,
      points = 4096, finderMs = 300)
    val h = s.registry.get("render.all.requests").get.asInstanceOf[DurationHistogram]
    val f = s.registry.get("render.all.requests_finder").get.asInstanceOf[DurationHistogram]
    assert(h.totalCount == 1 && h.bucketCounts(3) == 1) // 1500 → _to_2000ms
    assert(f.totalCount == 1 && f.bucketCounts(1) == 1) // 300 → _to_500ms
    assert(sink.values("render.all.metrics") == Seq(12L))
    assert(sink.values("render.all.points") == Seq(4096L))
  }

  test("query send: ch_* sampled when read, read_* only on success") {
    val s = new Service(MetricsConfig(metricEndpoint = "127.0.0.1:2003"))
    val sink = new CollectingStat
    val q = s.query("points")
    q.send(3600, 120, readRows = 10, readBytes = 800,
      chReadRows = 50000, chReadBytes = 1 << 20, err = false, sink)
    q.send(3600, 30, readRows = 0, readBytes = 0,
      chReadRows = 0, chReadBytes = 0, err = true, sink)
    assert(sink.values("query.points.all.ch_read_rows") == Seq(50000L))
    assert(sink.values("query.points.all.read_rows") == Seq(10L))
    assert(s.registry.get("query.points.all.errors").get
      .asInstanceOf[Counter].count == 1)
  }

  // ---------------------------------------------------------------
  // histogram shape + graphite emission
  // ---------------------------------------------------------------

  test("histogram buckets are inclusive-upper and rows cumulative") {
    val h = new DurationHistogram(Seq(200L, 500L), Seq("_to_200ms", "_to_500ms", "_to_inf"))
    Seq(1L, 200L, 201L, 500L, 9999L).foreach(h.add)
    assert(h.bucketCounts == Seq(2L, 2L, 1L))
    assert(h.rows == Seq(("_to_200ms", 2L), ("_to_500ms", 4L), ("_to_inf", 5L)))
  }

  test("renderLines emits prefix.name value ts graphite lines") {
    val s = new Service(MetricsConfig(metricEndpoint = "127.0.0.1:2003",
      metricPrefix = "graphite"))
    s.findCacheHits.add(3)
    s.find.all.requests.add(42)
    val lines = s.renderLines(1704067200L).split("\n").toSeq
    assert(lines.contains("graphite.find_cache_hits 3 1704067200"))
    assert(lines.contains("graphite.find.all.requests_to_200ms 1 1704067200"))
    assert(lines.contains("graphite.find.all.requests_to_inf 1 1704067200"))
    // every line is 3 space-separated fields
    assert(lines.forall(_.split(" ").length == 3))
  }

  test("flush writes the payload to a TCP relay; dead relay is survived") {
    val srv = new java.net.ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    try {
      val s = new Service(MetricsConfig(
        metricEndpoint = s"127.0.0.1:${srv.getLocalPort}", metricTimeoutMs = 2000))
      s.tagsWait.requests.inc()
      var got: Seq[String] = Nil
      val t = new Thread(() => {
        val sock = srv.accept()
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream))
        got = Iterator.continually(in.readLine()).takeWhile(_ != null).toSeq
        sock.close()
      })
      t.start()
      assert(s.flush(1704067200L))
      t.join(5000)
      assert(got.contains("graphite.tags_wait.all.requests 1 1704067200"))
      // relay gone → flush returns false, never throws
      srv.close()
      assert(!s.flush(1704067200L))
    } finally if (!srv.isClosed) srv.close()
  }

  test("statsd sink emits name:value|ms datagrams with the prefix") {
    val sock = new java.net.DatagramSocket(0, java.net.InetAddress.getLoopbackAddress)
    sock.setSoTimeout(5000)
    try {
      val sink = new UdpStatsd(s"127.0.0.1:${sock.getLocalPort}", "graphite")
      sink.timing("render.all.points", 4096L)
      val buf = new Array[Byte](512)
      val p = new java.net.DatagramPacket(buf, buf.length)
      sock.receive(p)
      assert(new String(p.getData, 0, p.getLength, "UTF-8") ==
        "graphite.render.all.points:4096|ms")
      sink.close()
    } finally sock.close()
  }
}
