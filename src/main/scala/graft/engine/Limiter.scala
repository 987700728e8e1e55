package graft.engine

/** Request-admission limiters — the Spark-service analog of the
  * reference's query limiter family (`limiter/limiter.go`,
  * `limiter/wlimiter.go`, `limiter/alimiter.go:40-75`):
  *
  *   - a *queue* cap (`max-queries`): how many requests may be queued
  *     or running at once; exceeding it refuses IMMEDIATELY
  *     (`limiter/limiter.go` `tryEnter` → `ErrOverflow`);
  *   - a *concurrency* cap (`concurrent-queries` / `max-concurrent`):
  *     how many storage reads may execute at once; excess requests
  *     WAIT until a slot frees or the request deadline expires
  *     (`limiter/limiter.go` `enter` → `ErrTimeout` on ctx done);
  *   - an *adaptive* reservation (`adaptive-queries`): under high
  *     load average, up to `n` of the concurrency slots are parked so
  *     a co-located storage engine keeps breathing room
  *     (`limiter/alimiter.go:17-37` `getWeighted`).
  *
  * Both refusals surface as HTTP 503 (`helper/clickhouse/
  * clickhouse.go:105-111`) with the reference's error strings.
  *
  * On a Spark cluster the concurrency cap is the driver-side
  * admission gate in front of job submission: it bounds how many
  * concurrent scans the scheduler sees, which composes with fair
  * scheduler pools — the pool shapes *running* work, the limiter
  * sheds *queued* work before it consumes driver/planner resources.
  *
  * One deliberate divergence: the reference rebalances the adaptive
  * reservation on a 60 s background ticker (`alimiter.go:75-100`);
  * here the reservation is recomputed from the load-average supplier
  * at each `enter`, which is deterministic under test and equivalent
  * at steady state (the supplier itself can cache/smooth).
  */
object Limiter {

  /** `limiter/interface.go:9-11` error strings, mapped to 503 like
    * `helper/clickhouse.HandleError`.
    */
  val TimeoutMessage = "timeout exceeded"
  val OverflowMessage = "storage maximum queries exceeded"

  private def timeoutError: Guards.StorageError =
    Guards.StorageError(503, TimeoutMessage)
  private def overflowError: Guards.StorageError =
    Guards.StorageError(503, OverflowMessage)

  /** Normalized system load average (1-min loadavg / cores), the
    * `load_avg.Load()` equivalent; NaN-safe, never negative.
    */
  def systemLoadAvg(): Double = {
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val la = os.getSystemLoadAverage
    if (la.isNaN || la < 0) 0.0
    else la / math.max(1, os.getAvailableProcessors)
  }

  /** Reserved concurrency slots for a load average
    * (`alimiter.go:17-37`): nothing below 0.6; `⌊n·loadAvg⌋` above,
    * clamped to keep at least one usable slot (`max-1`, or 1 when the
    * pool is that small).
    */
  def getWeighted(n: Int, max: Int, loadAvg: Double): Int = {
    if (n <= 0) return 0
    if (loadAvg < 0.6) return 0
    val l = (n.toDouble * loadAvg).toInt
    if (l >= max) { if (max <= 1) 1 else max - 1 }
    else l
  }

  sealed trait ServerLimiter {
    /** false = noop; callers may skip enter/leave entirely
      * (`limiter/interface.go` `Enabled`).
      */
    def enabled: Boolean

    /** Claim a slot, waiting at most `waitMs` where this variant
      * queues; throws `Guards.StorageError(503, …)` on refusal.
      */
    def enter(waitMs: Long): Unit

    /** Claim a slot without waiting (`TryEnter`). */
    def tryEnter(): Unit

    def leave(): Unit

    final def withSlot[T](waitMs: Long)(body: => T): T = {
      enter(waitMs)
      try body finally leave()
    }
  }

  /** Disabled limiter (`limiter/noop.go`). */
  case object Noop extends ServerLimiter {
    def enabled: Boolean = false
    def enter(waitMs: Long): Unit = ()
    def tryEnter(): Unit = ()
    def leave(): Unit = ()
  }

  /** A counted slot pool with a reservation watermark. Monitor-based
    * rather than a Semaphore because the effective capacity
    * (`cap - reserved`) changes under the adaptive policy.
    */
  private final class Slots(val cap: Int) {
    private var used = 0
    private var reservedSlots = 0

    def setReserved(n: Int): Unit = synchronized {
      val next = math.max(0, math.min(n, cap))
      val widened = next < reservedSlots
      reservedSlots = next
      if (widened) notifyAll()
    }

    def tryAcquire(): Boolean = synchronized {
      if (used < cap - reservedSlots) { used += 1; true } else false
    }

    def acquire(waitMs: Long): Boolean = synchronized {
      val deadline = System.nanoTime() + math.max(0L, waitMs) * 1000000L
      while (used >= cap - reservedSlots) {
        val remMs = (deadline - System.nanoTime()) / 1000000L
        if (remMs <= 0) return false
        wait(remMs)
      }
      used += 1
      true
    }

    def release(): Unit = synchronized {
      if (used > 0) used -= 1
      notifyAll()
    }
  }

  /** Queue-capacity-only limiter (`limiter/limiter.go` `Limiter`):
    * waits for a slot up to the request deadline.
    */
  private final class QueueLimiter(capacity: Int) extends ServerLimiter {
    private val slots = new Slots(capacity)
    def enabled: Boolean = true
    def enter(waitMs: Long): Unit =
      if (!slots.acquire(waitMs)) throw timeoutError
    def tryEnter(): Unit =
      if (!slots.tryAcquire()) throw overflowError
    def leave(): Unit = slots.release()
  }

  /** Queue cap + concurrency cap (`limiter/wlimiter.go` `WLimiter`):
    * the queue cap refuses immediately (overflow), the concurrency cap
    * queues until the deadline (timeout). `adaptive > 0` adds the
    * load-average reservation of `ALimiter`.
    */
  private final class WeightedLimiter(
      capacity: Int,
      concurrent: Int,
      adaptive: Int,
      loadAvg: () => Double) extends ServerLimiter {
    private val queue = if (capacity > 0) new Slots(capacity) else null
    private val conc = if (concurrent > 0) new Slots(concurrent) else null

    def enabled: Boolean = true

    def enter(waitMs: Long): Unit = {
      if (queue != null && !queue.tryAcquire()) throw overflowError
      if (conc != null) {
        if (adaptive > 0)
          conc.setReserved(getWeighted(adaptive, concurrent, loadAvg()))
        if (!conc.acquire(waitMs)) {
          if (queue != null) queue.release()
          throw timeoutError
        }
      }
    }

    def tryEnter(): Unit = {
      if (queue != null && !queue.tryAcquire()) throw overflowError
      if (conc != null) {
        if (adaptive > 0)
          conc.setReserved(getWeighted(adaptive, concurrent, loadAvg()))
        if (!conc.tryAcquire()) {
          if (queue != null) queue.release()
          throw timeoutError
        }
      }
    }

    def leave(): Unit = {
      if (queue != null) queue.release()
      if (conc != null) conc.release()
    }
  }

  /** Factory with the `NewALimiter` selection rules
    * (`alimiter.go:49-71`): no caps → [[Noop]]; adaptive clamped below
    * the concurrency cap; without an effective adaptive share the
    * W/plain variants apply (`wlimiter.go:17-40`).
    */
  def apply(
      maxQueries: Int,
      concurrent: Int,
      adaptive: Int = 0,
      loadAvg: () => Double = systemLoadAvg _): ServerLimiter = {
    if (maxQueries <= 0 && concurrent <= 0) return Noop
    val n = if (adaptive >= concurrent) concurrent - 1 else adaptive
    if (n <= 0) {
      if (concurrent <= 0) new QueueLimiter(maxQueries)
      else new WeightedLimiter(maxQueries, concurrent, 0, loadAvg)
    } else new WeightedLimiter(maxQueries, concurrent, n, loadAvg)
  }

  /** Config normalization (`config.go:603-605,739-745`): a
    * concurrency cap larger than the queue cap is meaningless (the
    * queue refuses first) and is dropped.
    */
  def normalizedConcurrent(maxQueries: Int, concurrent: Int): Int =
    if (concurrent > maxQueries && maxQueries > 0) 0 else concurrent
}
