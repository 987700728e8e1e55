package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Guards.StorageError

/** Limiter semantics vs the reference's `limiter/alimiter_test.go`
  * (`Test_getWeighted`, `TestNewALimiter`) and the W/plain variants'
  * refusal behavior (`limiter/wlimiter.go`, `limiter/limiter.go`).
  */
class LimiterSpec extends AnyFunSuite {

  test("getWeighted reference vectors (alimiter_test.go Test_getWeighted)") {
    val vectors = Seq(
      // (loadAvg, max, n, want)
      (0.0, 100, 100, 0),
      (0.2, 100, 100, 0),
      (0.7, 100, 100, 70),
      (0.8, 100, 100, 80),
      (0.999, 100, 100, 99),
      (0.999, 100, 1, 0),
      (1.0, 1, 100, 1),
      (1.0, 100, 100, 99),
      (1.0, 101, 100, 100),
      (1.0, 200, 100, 100),
      (2.0, 100, 200, 99),
      (2.0, 200, 200, 199),
      (2.0, 300, 200, 299),
      (2.0, 400, 200, 399),
      (2.0, 401, 200, 400),
      (2.0, 402, 200, 400))
    for ((la, max, n, want) <- vectors)
      assert(Limiter.getWeighted(n, max, la) == want, s"loadAvg=$la n=$n max=$max")
  }

  test("factory selection: no caps → Noop; caps → enabled") {
    assert(Limiter(0, 0) == Limiter.Noop)
    assert(!Limiter.Noop.enabled)
    assert(Limiter(10, 0).enabled)
    assert(Limiter(0, 10).enabled)
    assert(Limiter(10, 5, adaptive = 3).enabled)
  }

  test("queue cap refuses immediately with the overflow message") {
    val l = Limiter(maxQueries = 2, concurrent = 0)
    // queue-only limiter: enter QUEUES (here: nothing to queue behind,
    // slots free), the 3rd concurrent claim times out
    l.enter(waitMs = 10); l.enter(waitMs = 10)
    val e = intercept[StorageError](l.enter(waitMs = 10))
    assert(e.code == 503 && e.message == Limiter.TimeoutMessage)
    val o = intercept[StorageError](l.tryEnter())
    assert(o.code == 503 && o.message == Limiter.OverflowMessage)
    l.leave(); l.leave()
    // slots free again
    l.tryEnter(); l.leave()
  }

  test("w-limiter: queue overflow is immediate, concurrency waits then times out") {
    val l = Limiter(maxQueries = 3, concurrent = 2)
    l.enter(waitMs = 10)
    l.enter(waitMs = 10)
    // 3rd request: queue slot free (cap 3) but both concurrency slots
    // busy → waits waitMs, then ErrTimeout — and releases its queue slot
    val t = intercept[StorageError](l.enter(waitMs = 50))
    assert(t.message == Limiter.TimeoutMessage)
    // a parked waiter holds the 3rd queue slot while queued on
    // concurrency — NOW the queue is full and further claims overflow
    // immediately (the reference's 503 "storage maximum queries
    // exceeded" shed path)
    val unblocked = new java.util.concurrent.CountDownLatch(1)
    val waiter = new Thread(() => { l.enter(waitMs = 30000); unblocked.countDown() })
    waiter.setDaemon(true)
    waiter.start()
    val deadline = System.nanoTime() + 5000000000L
    var sawOverflow = false
    while (!sawOverflow && System.nanoTime() < deadline) {
      try { l.tryEnter(); l.leave(); Thread.sleep(5) }
      catch {
        case e: StorageError =>
          // Timeout here = waiter hasn't taken its queue slot yet
          if (e.message == Limiter.OverflowMessage) sawOverflow = true
          else Thread.sleep(5)
      }
    }
    assert(sawOverflow, "queue never filled → no overflow refusal observed")
    // a freed concurrency slot admits the parked waiter
    l.leave()
    assert(unblocked.await(5, java.util.concurrent.TimeUnit.SECONDS),
      "waiting enter was not released by leave()")
  }

  test("adaptive reservation parks slots under load (TestNewALimiter shape)") {
    @volatile var la = 0.0
    val concurrent = 12
    val n = 10
    val l = Limiter(maxQueries = 14, concurrent = concurrent, adaptive = n, loadAvg = () => la)

    // load not collected: all 12 concurrency slots usable
    (1 to concurrent).foreach(_ => l.enter(waitMs = 10))
    assert(intercept[StorageError](l.enter(waitMs = 10)).message == Limiter.TimeoutMessage)
    (1 to concurrent).foreach(_ => l.leave())

    // load 0.5 → k = 0 reserved (below the 0.6 floor)
    la = 0.5
    assert(Limiter.getWeighted(n, concurrent, la) == 0)

    // load 0.6 → k = 6 reserved; only concurrent-k slots usable
    la = 0.6
    val k = Limiter.getWeighted(n, concurrent, la)
    assert(k == n * 6 / 10)
    (1 to (concurrent - k)).foreach(_ => l.enter(waitMs = 10))
    assert(intercept[StorageError](l.enter(waitMs = 10)).message == Limiter.TimeoutMessage)
    (1 to (concurrent - k)).foreach(_ => l.leave())

    // load 1 → k = n reserved
    la = 1.0
    assert(Limiter.getWeighted(n, concurrent, la) == n)
    (1 to (concurrent - n)).foreach(_ => l.enter(waitMs = 10))
    assert(intercept[StorageError](l.enter(waitMs = 10)).message == Limiter.TimeoutMessage)
    (1 to (concurrent - n)).foreach(_ => l.leave())

    // adaptive >= concurrent is clamped to concurrent-1 (alimiter.go:55-57)
    la = 10.0
    val clamped = Limiter(maxQueries = 0, concurrent = 2, adaptive = 5, loadAvg = () => la)
    clamped.enter(waitMs = 10) // 1 reserved of 2 → one slot usable
    assert(intercept[StorageError](clamped.enter(waitMs = 10)).message == Limiter.TimeoutMessage)
    clamped.leave()
  }

  test("normalizedConcurrent drops a concurrency cap above the queue cap") {
    assert(Limiter.normalizedConcurrent(maxQueries = 10, concurrent = 20) == 0)
    assert(Limiter.normalizedConcurrent(maxQueries = 0, concurrent = 20) == 20)
    assert(Limiter.normalizedConcurrent(maxQueries = 30, concurrent = 20) == 20)
  }

  test("withSlot releases on success and on failure") {
    val l = Limiter(maxQueries = 1, concurrent = 1)
    assert(l.withSlot(10)(7) == 7)
    intercept[IllegalStateException](l.withSlot(10)(throw new IllegalStateException("x")))
    // slot is free again
    l.tryEnter(); l.leave()
  }
}
