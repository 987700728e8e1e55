package graft.sd

import org.scalatest.funsuite.AnyFunSuite

/** Service-discovery registration semantics against the reference's
  * own test vectors: the nginx-upsync key/body layout
  * (`sd/nginx/nginx_test.go`) and the full load→weight curve table
  * (`load_avg/load_avg_test.go`).
  */
class SdSpec extends AnyFunSuite {

  private val t0 = 1682408721L

  private def mk(ns: String, host: String, store: KvStore) =
    new NginxSd(store, ns, host, now = () => t0)

  test("register without DCs: '_' key, weight body, timestamp flags") {
    val store = new InMemoryKvStore("upstreams/graphite/")
    val sd = mk("graphite", "test_host1", store)
    assert(sd.update("192.168.0.1", ":9090", Nil, 10).isRight)
    assert(sd.list() == Right(Seq("_/test_host1/192.168.0.1:9090")))
    assert(sd.listMap() == Right(Map(
      "_/test_host1/192.168.0.1:9090" -> """{"weight":10,"max_fails":0}""")))
    assert(sd.nodes().toOption.get.head.flags == t0)
  }

  test("empty namespace defaults to graphite; other hosts filtered from list") {
    val store = new InMemoryKvStore("upstreams/graphite/")
    val sd1 = mk("", "test_host1", store)
    val sd2 = mk("", "test_host2", store)
    assert(sd1.namespace == "graphite")
    assert(sd1.update("192.168.0.1", ":9090", Nil, 10).isRight)
    assert(sd2.update("192.168.1.25", ":9090", Nil, 21).isRight)
    assert(sd1.list() == Right(Seq("_/test_host1/192.168.0.1:9090")))
    assert(sd2.list() == Right(Seq("_/test_host2/192.168.1.25:9090")))
    // nodes() sees the whole namespace
    assert(sd1.nodes().toOption.get.size == 2)
  }

  test("register with DCs: first is primary, the rest are backups") {
    val store = new InMemoryKvStore("upstreams/graphite/")
    val sd = mk("graphite", "test_host1", store)
    assert(sd.update("192.168.0.1", ":9090", Seq("dc1", "dc2", "dc3"), 15).isRight)
    val m = sd.listMap().toOption.get
    assert(m == Map(
      "dc1/test_host1/192.168.0.1:9090" -> """{"weight":15,"max_fails":0}""",
      "dc2/test_host1/192.168.0.1:9090" -> """{"backup":1,"max_fails":0}""",
      "dc3/test_host1/192.168.0.1:9090" -> """{"backup":1,"max_fails":0}"""))
  }

  test("re-register updates weight in place; non-positive weight floors at 1") {
    val store = new InMemoryKvStore("upstreams/graphite/")
    val sd = mk("graphite", "h", store)
    sd.update("10.0.0.1", ":80", Nil, 10)
    sd.update("10.0.0.1", ":80", Nil, 30)
    assert(sd.listMap().toOption.get("_/h/10.0.0.1:80") ==
      """{"weight":30,"max_fails":0}""")
    sd.update("10.0.0.1", ":80", Nil, 0)
    assert(sd.listMap().toOption.get("_/h/10.0.0.1:80") ==
      """{"weight":1,"max_fails":0}""")
  }

  test("clear preserves the current listen address, drops stale ones") {
    val store = new InMemoryKvStore("upstreams/graphite/")
    val sd = mk("graphite", "h", store)
    sd.update("10.0.0.1", ":80", Nil, 1)
    sd.update("10.0.0.2", ":80", Nil, 1) // stale IP from before a move
    val other = mk("graphite", "other", store)
    other.update("10.9.9.9", ":80", Nil, 1)
    assert(sd.clear("10.0.0.2", ":80").isRight)
    assert(sd.list() == Right(Seq("_/h/10.0.0.2:80")))
    // other hostnames untouched
    assert(other.list() == Right(Seq("_/other/10.9.9.9:80")))
    // clear("", "") drops everything for the hostname
    assert(sd.clear("", "").isRight)
    assert(sd.list() == Right(Nil))
  }

  test("delete removes per-DC records; deleteNode removes a verbatim key") {
    val store = new InMemoryKvStore("upstreams/graphite/")
    val sd = mk("graphite", "h", store)
    sd.update("10.0.0.1", ":80", Seq("dc1", "dc2"), 5)
    assert(sd.delete("10.0.0.1", ":80", Seq("dc1")).isRight)
    assert(sd.list().toOption.get.toSet == Set("dc2/h/10.0.0.1:80"))
    assert(sd.deleteNode("dc2/h/10.0.0.1:80").isRight)
    assert(sd.list() == Right(Nil))
  }

  test("expire sweeps only records older than the horizon") {
    val store = new InMemoryKvStore("upstreams/graphite/")
    var clock = t0
    val sd = new NginxSd(store, "graphite", "h", now = () => clock)
    sd.update("10.0.0.1", ":80", Nil, 1)
    clock += 100
    sd.update("10.0.0.2", ":80", Nil, 1)
    clock += 100
    // horizon 150: only the first record (age 200 > 150) expires
    assert(sd.expire(150L) == Right(Seq("_/h/10.0.0.1:80")))
    assert(sd.list() == Right(Seq("_/h/10.0.0.2:80")))
  }

  test("splitNode: exactly dc/host/listen") {
    val sd = mk("graphite", "h", new InMemoryKvStore("upstreams/graphite/"))
    assert(sd.splitNode("dc1/host/1.2.3.4:80") == Some(("dc1", "host", "1.2.3.4:80")))
    assert(sd.splitNode("_/host/1.2.3.4:80") == Some(("_", "host", "1.2.3.4:80")))
    assert(sd.splitNode("no-slashes").isEmpty)
    assert(sd.splitNode("a/b/c/d").isEmpty)
  }

  test("weight curve matches the reference vector table") {
    // (weight, degradedMultiply, degradedLoad, loadAvg) -> want,
    // verbatim from load_avg_test.go (defaults 4 / 1.0)
    val vectors = Seq(
      (100, 4.0, 1.0, 0.0, 200L), (100, 4.0, 1.0, 0.1, 199L),
      (100, 4.0, 1.0, 0.11, 199L), (100, 4.0, 1.0, 0.2, 169L),
      (100, 4.0, 1.0, 0.5, 130L), (100, 4.0, 1.0, 0.9, 104L),
      (100, 4.0, 1.0, 1.0, 100L), (100, 4.0, 1.0, 1.1, 36L),
      (100, 4.0, 1.0, 1.9, 12L), (100, 4.0, 1.0, 2.0, 1L),
      (100, 4.0, 1.0, 9.0, 1L), (100, 4.0, 1.0, 20.0, 1L),
      (1000, 4.0, 1.0, 0.0, 2000L), (1000, 4.0, 1.0, 0.1, 1999L),
      (1000, 4.0, 1.0, 0.2, 1698L), (1000, 4.0, 1.0, 0.5, 1301L),
      (1000, 4.0, 1.0, 0.9, 1045L), (1000, 4.0, 1.0, 1.0, 1000L),
      (1000, 4.0, 1.0, 1.1, 357L), (1000, 4.0, 1.0, 1.9, 120L),
      (1000, 4.0, 1.0, 2.0, 1L), (1000, 4.0, 1.0, 10.0, 1L),
      (100, 4.0, 0.8, 0.0, 200L), (100, 4.0, 0.8, 0.8, 109L),
      (100, 4.0, 0.8, 0.81, 50L), (100, 4.0, 0.8, 0.9, 45L),
      (100, 4.0, 0.8, 1.0, 40L), (100, 4.0, 0.8, 1.1, 36L),
      (100, 4.0, 0.8, 1.9, 12L), (100, 4.0, 0.8, 2.0, 1L),
      (1000, 8.0, 0.8, 0.0, 2000L), (1000, 8.0, 0.8, 0.8, 1096L),
      (1000, 8.0, 0.8, 0.81, 188L), (1000, 8.0, 0.8, 0.9, 143L),
      (1000, 8.0, 0.8, 1.0, 97L), (1000, 8.0, 0.8, 1.2, 18L),
      (1000, 8.0, 0.8, 1.3, 1L), (1000, 8.0, 0.8, 2.0, 1L))
    for ((w, dm, dl, la, want) <- vectors)
      assert(LoadAvg.weight(w, dm, dl, la) == want,
        s"weight($w, $dm, $dl, $la)")
    // guards: zero weight / non-degrading multiplier always 1
    assert(LoadAvg.weight(0, 4.0, 1.0, 0.5) == 1L)
    assert(LoadAvg.weight(100, 1.0, 1.0, 0.5) == 1L)
  }

  test("normalized load reads /proc/loadavg when present") {
    LoadAvg.normalized() match {
      case Some(v) => assert(v >= 0.0)
      case None => // non-linux environment: acceptable
    }
    LoadAvg.store(0.42)
    assert(LoadAvg.load == 0.42)
  }
}
