package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import FindCache._

/** Unit coverage for the find-result TTL cache (U4): hit/miss/expiry,
  * short-vs-default TTL selection (`render/handler.go:45-56`), and
  * the key schemes (`render/handler.go:41-43`, `find/handler.go:137-138`).
  */
class FindCacheSpec extends AnyFunSuite {

  private val cfg = Config(
    defaultTimeoutSec = 300,
    shortTimeoutSec = 60,
    shortDurationSec = 240,
    findTimeoutSec = 120)

  test("hit, miss, expiry") {
    val c = new TtlCache[String]()
    assert(c.get("k", 1000) == None)
    c.put("k", "v", ttlSec = 60, nowSec = 1000)
    assert(c.get("k", 1000).contains("v"))
    assert(c.get("k", 1059).contains("v"))
    assert(c.get("k", 1060) == None) // expired exactly at deadline
    assert(c.get("k", 2000) == None)
  }

  test("zero TTL never stores") {
    val c = new TtlCache[String]()
    c.put("k", "v", ttlSec = 0, nowSec = 1000)
    assert(c.get("k", 1000) == None)
  }

  test("through computes once and then serves hits") {
    val c = new TtlCache[Int]()
    var computes = 0
    val (v1, hit1) = through(c, "k", 60, 1000) { computes += 1; 42 }
    val (v2, hit2) = through(c, "k", 60, 1030) { computes += 1; 43 }
    assert(v1 == 42 && !hit1)
    assert(v2 == 42 && hit2)
    assert(computes == 1)
    // expired → recompute
    val (v3, hit3) = through(c, "k", 60, 2000) { computes += 1; 44 }
    assert(v3 == 44 && !hit3 && computes == 2)
  }

  test("short TTL for small recent windows, default otherwise") {
    val now = 1704067205L
    // small window ending now → short
    assert(renderTimeout(cfg, now, now - 10, now + 5) == 60)
    // window longer than short-duration → default
    assert(renderTimeout(cfg, now, now - 250, now) == 300)
    // old window (until far behind now) → default
    assert(renderTimeout(cfg, now, now - 4000, now - 3900) == 300)
    // no short-duration configured → always default
    assert(renderTimeout(cfg.copy(shortDurationSec = 0), now, now - 10, now) == 300)
  }

  test("target key is date-granular") {
    val rnow = 1704067200L // 2024-01-01 00:00:00 UTC
    // same dates, different intra-day offsets → same entry
    assert(targetKey(rnow, rnow + 10, "a.b", 60) == targetKey(rnow, rnow + 20, "a.b", 60))
    // crossing a date boundary changes the key
    assert(targetKey(rnow - 270, rnow - 20, "a.b", 300) !=
      targetKey(rnow - 270, rnow, "a.b", 300))
    assert(targetKey(rnow, rnow + 10, "a.b", 60) != targetKey(rnow, rnow + 10, "a.c", 60))
    assert(targetKey(rnow, rnow + 10, "a.b", 60) != targetKey(rnow, rnow + 10, "a.b", 300))
  }

  test("find key truncates now to the TTL generation") {
    assert(findKey("q", 1000, 120) == findKey("q", 1079, 120))
    assert(findKey("q", 1079, 120) != findKey("q", 1080, 120))
    assert(findKey("q", 1000, 120) != findKey("q2", 1000, 120))
  }

  test("eviction sweep keeps the cache bounded") {
    val c = new TtlCache[Int](maxEntries = 4)
    (1 to 4).foreach(i => c.put(s"k$i", i, 10, 1000))
    assert(c.size == 4)
    // all expired by 2000; inserting sweeps them out
    c.put("k5", 5, 10, 2000)
    assert(c.size == 1)
    assert(c.get("k5", 2001).contains(5))
  }
}
