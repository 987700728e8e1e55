package graft.engine

import java.time.{Instant, ZoneOffset}
import java.util.concurrent.ConcurrentHashMap

/** Find-result TTL cache (U4) — the engine-side analog of the
  * reference's `common.find-cache` (`cache/cache.go:25-48`,
  * `render/handler.go:41-56`, `find/handler.go:133-159`).
  *
  * Caches the *find result* (the matched path set — a response-sized
  * driver value), never point data: the fixture matrix pins exactly
  * that split (`tests/find_cache`: a cached find with a longer render
  * window still returns the longer fresh grid).
  *
  * Windows ending near now get the short TTL (recent index rows are
  * still being written); historical windows the default TTL; plain
  * finds and autocomplete the find TTL with a now-truncated key so
  * entries roll over in lockstep.
  */
object FindCache {

  /** `[common.find-cache]` knobs (`config/config.go:86-96`; short
    * offset defaults to 120 s, `config.go:929-933`).
    */
  final case class Config(
      defaultTimeoutSec: Int = 0,
      shortTimeoutSec: Int = 0,
      shortDurationSec: Long = 0L,
      shortUntilOffsetSec: Long = 120L,
      findTimeoutSec: Int = 0)

  /** Thread-safe in-memory TTL map. The clock is a parameter so tests
    * (and the deterministic fixture runner) control expiry; entries
    * are swept opportunistically on write once `maxEntries` is
    * exceeded (the reference delegates the same job to expirecache's
    * ApproximateCleaner goroutine).
    */
  final class TtlCache[V](maxEntries: Int = 65536) {
    private val map = new ConcurrentHashMap[String, (Long, V)]()

    def get(key: String, nowSec: Long): Option[V] = {
      val e = map.get(key)
      if (e == null) None
      else if (e._1 <= nowSec) { map.remove(key); None }
      else Some(e._2)
    }

    def put(key: String, value: V, ttlSec: Int, nowSec: Long): Unit = {
      if (ttlSec <= 0) return
      if (map.size() >= maxEntries) {
        val it = map.entrySet().iterator()
        while (it.hasNext) if (it.next().getValue._1 <= nowSec) it.remove()
        // maxEntries is a hard cap, not just a sweep trigger: with
        // attacker-controlled keys nothing may be expired, so evict
        // the soonest-to-expire live entries to make room
        if (map.size() >= maxEntries) {
          import scala.jdk.CollectionConverters._
          map.entrySet().asScala.toSeq
            .sortBy(_.getValue._1)
            .take(map.size() - maxEntries + 1)
            .foreach(e => map.remove(e.getKey))
        }
      }
      map.put(key, (nowSec + ttlSec, value))
    }

    def size: Int = map.size()
  }

  /** TTL for a render-find: short for small recent windows, default
    * otherwise (`render/handler.go:45-56`).
    */
  def renderTimeout(cfg: Config, nowSec: Long, from: Long, until: Long): Int =
    if (renderUsesShort(cfg, nowSec, from, until)) cfg.shortTimeoutSec
    else cfg.defaultTimeoutSec

  /** Which branch `renderTimeout` took — telemetry attributes cache
    * hits to the short/default counter pairs accordingly
    * (`render/handler.go:45-56` returns the metric handle with the
    * timeout).
    */
  def renderUsesShort(cfg: Config, nowSec: Long, from: Long, until: Long): Boolean = {
    if (cfg.shortDurationSec == 0) return false
    val duration = until - from
    !(duration > cfg.shortDurationSec || nowSec - until > cfg.shortUntilOffsetSec)
  }

  private def day(ts: Long): String =
    Instant.ofEpochSecond(ts).atZone(ZoneOffset.UTC).toLocalDate.toString

  /** Render-find key: date-granular window + target + ttl
    * (`render/handler.go:41-43`) — windows on the same days share the
    * entry regardless of intra-day offsets.
    */
  def targetKey(from: Long, until: Long, target: String, ttlSec: Int): String =
    s"${day(from)};${day(until)};$target;ttl=$ttlSec"

  /** /metrics/find key (`find/handler.go:137-138`): the `ts` factor
    * truncates now to the TTL so all entries of a generation expire
    * together.
    */
  def findKey(query: String, nowSec: Long, findTimeoutSec: Int): String = {
    val ts = if (findTimeoutSec == 0) nowSec else nowSec - nowSec % findTimeoutSec.toLong
    s"1970-02-12;query=$query;ts=$ts"
  }

  /** Autocomplete key (`autocomplete/autocomplete.go:300-330` builds
    * the same shape from the request params).
    */
  def autocompleteKey(kind: String, params: String, nowSec: Long, findTimeoutSec: Int): String = {
    val ts = if (findTimeoutSec == 0) nowSec else nowSec - nowSec % findTimeoutSec.toLong
    s"1970-02-12;$kind;$params;ts=$ts"
  }

  /** Get-or-compute helper: returns (value, wasHit). Concurrent
    * misses on the SAME key serialize on a per-key in-flight lock so
    * identical requests don't stampede the backing Spark job (the
    * workload the cache exists to absorb); distinct keys stay fully
    * concurrent.
    */
  def through[V](cache: TtlCache[V], key: String, ttlSec: Int, nowSec: Long)(
      compute: => V): (V, Boolean) =
    cache.get(key, nowSec) match {
      case Some(v) => (v, true)
      case None =>
        val lock = inflight.computeIfAbsent(key, _ => new Object)
        try lock.synchronized {
          cache.get(key, nowSec) match {
            case Some(v) => (v, true) // another thread filled it
            case None =>
              val v = compute
              cache.put(key, v, ttlSec, nowSec)
              (v, false)
          }
        } finally inflight.remove(key)
    }

  private val inflight = new ConcurrentHashMap[String, Object]()
}
