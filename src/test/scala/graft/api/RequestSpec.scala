package graft.api

import java.time.{Instant, ZoneId}

import org.scalatest.funsuite.AnyFunSuite

/** Request parsing: graphite time grammar → TimeFrame grouping. */
class RequestSpec extends AnyFunSuite {
  private val now = Instant.ofEpochSecond(1704070800L) // 2024-01-01 01:00 UTC
  private val utc = ZoneId.of("UTC")

  test("form request: relative from/until through the time grammar") {
    val Right(r) = Request.parseRender(
      Seq("a.b.*", "c.d"), "-1h", "now", Some(100), now, utc)
    val (tf, targets) = r.frames.head
    assert(tf.from == now.getEpochSecond - 3600)
    assert(tf.until == now.getEpochSecond)
    assert(tf.maxDataPoints == 100)
    assert(targets == Seq("a.b.*", "c.d"))
  }

  test("epoch and defaults") {
    val Right(r) = Request.parseRender(Seq("x"), "1704067200", "", None, now, utc)
    val (tf, _) = r.frames.head
    assert(tf.from == 1704067200L)
    assert(tf.until == now.getEpochSecond) // empty until → now
    assert(tf.maxDataPoints == Request.DefaultMaxDataPoints)
  }

  test("errors: no targets, inverted window, bad grammar") {
    assert(Request.parseRender(Nil, "-1h", "now", None, now, utc).isLeft)
    assert(Request.parseRender(Seq("x"), "now", "-2h", None, now, utc).isLeft)
    assert(Request.parseRender(Seq("x"), "bogus!!", "now", None, now, utc).isLeft)
  }

  test("v3 multi-window grouping") {
    val r = Request.fromV3(Seq(
      ("a", 100L, 200L, 0L), ("b", 100L, 200L, 0L), ("c", 50L, 200L, 10L)))
    assert(r.frames.length == 2)
    assert(r.frames.map { case (tf, ts) => (tf.from, tf.until, tf.maxDataPoints, ts) } ==
      Seq((50L, 200L, 10L, Seq("c")),
        (100L, 200L, Request.DefaultMaxDataPoints, Seq("a", "b"))))
  }
}
