package graft.events

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Funnel fold semantics: strict time progression, conversion window,
  * first-touch attribution.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(rows: (Long, String, Long)*) = {
    import spark.implicits._
    Funnel.funnel3(rows.toDF("user_id", "event_type", "t"),
        steps = Seq("view", "click", "purchase"),
        userCol = col("user_id"), typeCol = col("event_type"),
        timeCol = col("t"), windowSec = 100L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))))
      .toMap
  }

  test("stages complete strictly in order within the window") {
    val out = run(
      (1L, "view", 10L), (1L, "click", 50L), (1L, "purchase", 120L),
      // user 2: click BEFORE the view never counts
      (2L, "click", 5L), (2L, "view", 10L),
      // user 3: click outside the window -> funnel stalls at stage 1
      (3L, "view", 10L), (3L, "click", 200L),
      // user 4: same-timestamp click does not complete two stages
      (4L, "view", 10L), (4L, "click", 10L), (4L, "purchase", 20L))
    assert(out(1L) == ((Some(10L), Some(50L), Some(120L), 3L)))
    assert(out(2L) == ((Some(10L), None, None, 1L)))
    assert(out(3L) == ((Some(10L), None, None, 1L)))
    // purchase at 20 needs a completed click first — stage stays 1
    assert(out(4L) == ((Some(10L), None, None, 1L)))
  }

  test("retention: cohort by first anchor, active periods count once") {
    import spark.implicits._
    // period = 100s. u1 signs up in period 0, active 0/1/3 (the
    // period-1 duplicate counts once); u2 signs up period 1, active 1;
    // u3 never signs up -> no cohort; u1's pre-signup activity would
    // be negative-offset and is excluded
    val df = Seq(
      (1L, "signup", 10L), (1L, "view", 120L), (1L, "view", 150L),
      (1L, "click", 310L),
      (2L, "signup", 130L), (2L, "view", 160L),
      (3L, "view", 20L)).toDF("user_id", "event_type", "t")
    val out = Funnel.retention(df, "signup",
        col("user_id"), col("event_type"), col("t"), periodSec = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L, // u1
      (1L, 0L) -> 1L))                                 // u2
  }

  test("first-touch attribution: the FIRST view anchors, later ones do not retry") {
    // first view at 10 only converts via the click at 200 (outside
    // the 100s window); the second view at 150 would have converted,
    // but strict first-touch does not re-anchor
    val out = run(
      (7L, "view", 10L), (7L, "view", 150L), (7L, "click", 200L))
    assert(out(7L) == ((Some(10L), None, None, 1L)))
    // non-funnel event types are ignored entirely
    val out2 = run((8L, "error", 10L), (8L, "view", 20L), (8L, "click", 30L))
    assert(out2(8L) == ((Some(20L), Some(30L), None, 2L)))
  }

  test("transitions: per-user consecutive pairs, per-src shares, tie by event id") {
    import spark.implicits._
    val events = Seq(
      // u1: view -> click -> view (two transitions)
      (1L, "view", 10L, 100L), (1L, "click", 20L, 101L), (1L, "view", 30L, 102L),
      // u2: view -> view (same timestamp: event id orders the chain)
      (2L, "view", 50L, 201L), (2L, "view", 50L, 200L),
      // u3: a single event emits no transition
      (3L, "purchase", 5L, 300L))
      .toDF("user_id", "event_type", "t", "event_id")
    val out = Funnel.transitions(events,
        userCol = col("user_id"), typeCol = col("event_type"),
        timeCol = col("t"), idCol = col("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // src=view: view->click (u1) and view->view (u2) — u1's trailing
    // view is terminal and emits nothing -> shares 1/2 each
    assert(out(("view", "click")) == ((1L, 0.5)))
    assert(out(("view", "view")) == ((1L, 0.5)))
    // src=click: only click->view
    assert(out(("click", "view")) == ((1L, 1.0)))
    assert(out.size == 3, s"unexpected transitions: ${out.keySet}")
  }

  test("dau/wau: trailing window counts a user once, stickiness is dau over wau") {
    import spark.implicits._
    val day = 86400L
    // u1 active days 0 and 1 (twice on day 1); u2 active day 0 only;
    // u3 active day 8 (outside day 1's window, inside day 8's)
    val events = Seq(
      (1L, 10L), (1L, day + 5L), (1L, day + 6L),
      (2L, 20L),
      (3L, 8 * day + 1L)).toDF("user_id", "t")
    val out = Funnel.dauWau(events, col("user_id"), col("t"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // day 0: dau 2 (u1,u2), wau 2 (window days -6..0)
    assert(out(0L) == ((2L, 2L, 1.0)))
    // day 1: dau 1 (u1 once despite two events), wau 2 (u1,u2 in 0..1)
    assert(out(1L) == ((1L, 2L, 0.5)))
    // day 8: dau 1 (u3); u1's day-1 activity still inside 2..8? no —
    // window is trailing 7 days [2, 8], so only u3
    assert(out(8L) == ((1L, 1L, 1.0)))
    // days with no activity emit no dau row (join keeps dau days only)
    assert(out.keySet == Set(0L, 1L, 8L))
  }
}
