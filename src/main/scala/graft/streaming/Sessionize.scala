package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (SURVEY §2.9 depth): the
  * streaming twin of the batch `ev_sessionize` window query — same
  * gap rule (a quiet period longer than `gapSec` closes the session),
  * expressed as per-user state in `flatMapGroupsWithState` with an
  * event-time timeout instead of an unbounded sort window.
  *
  * Scale shape: state is one (start, end, count) triple per LIVE user
  * session — O(active users), independent of history length; the
  * state store shards by user hash across executors; event-time
  * timeouts emit idle sessions as the watermark passes `end + gap`,
  * so state can't accumulate. That is the property the batch window
  * variant (sort of ALL events per user) cannot offer on an unbounded
  * stream.
  */
object Sessionize {

  final case class Event(user_id: Long, t: Long)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class Session(
      user_id: Long, session_start: Long, session_end: Long, n_events: Long)

  /** `events` must carry (user_id: Long, event_time: Timestamp, t: Long);
    * the caller sets the watermark on `event_time`. Emits one row per
    * CLOSED session (append mode): sessions close either when a later
    * event of the same user arrives past the gap, or when the
    * watermark passes the session end + gap (event-time timeout).
    */
  def sessions(
      events: DataFrame,
      gapSec: Long = 1800L,
      lateness: String = "30 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("event_time", lateness)
      .as[(Long, java.sql.Timestamp, Long)](
        Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.scalaLong))
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processUser(gapSec))
  }

  /** Per-user transition: fold the micro-batch's events (sorted by
    * time — arrival order within a batch is not time order) into the
    * open session, emitting every session a gap closes; park the
    * still-open session in state with a timeout at `end + gap` past
    * the watermark.
    */
  private def processUser(gapSec: Long)(
      userId: Long,
      rows: Iterator[(Long, java.sql.Timestamp, Long)],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator.single(Session(userId, s.start, s.end, s.n))
    }
    val ts = rows.map(_._3).toArray.sorted
    val closed = Seq.newBuilder[Session]
    var open = state.getOption
    ts.foreach { t =>
      open match {
        // within the gap on either side: a late cross-batch event can
        // precede the open session's start, so the start must lower
        // (the batch twin's min(t)) — not just the end raised
        case Some(s) if t - s.end <= gapSec && s.start - t <= gapSec =>
          open = Some(SessionState(math.min(s.start, t), math.max(s.end, t), s.n + 1))
        case Some(s) if t > s.end =>
          closed += Session(userId, s.start, s.end, s.n)
          open = Some(SessionState(t, t, 1))
        case Some(_) =>
          // older than start − gap: a separate already-quiet past
          // session; emit it closed without disturbing the open one
          closed += Session(userId, t, t, 1)
        case None =>
          open = Some(SessionState(t, t, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      // closes when the watermark passes the gap after the last event
      state.setTimeoutTimestamp((s.end + gapSec) * 1000L)
    }
    closed.result().iterator
  }

  /** Convenience: graphite `events`-shaped frame (user_id, ts
    * nanoseconds) → the session input schema. */
  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      col("user_id"),
      timestamp_seconds((col("ts") / 1000000000L).cast("long")).as("event_time"),
      (col("ts") / 1000000000L).cast("long").as("t"))
}
