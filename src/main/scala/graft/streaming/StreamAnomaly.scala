package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming value-anomaly detection — the streaming twin of the
  * batch `ev_anomaly` z-score query. Each event is scored against the
  * running distribution of its event type SO FAR (Welford's online
  * mean/M2 — numerically stable, mergeable, O(1) per event) and
  * emitted when |z| crosses the threshold after a burn-in count.
  *
  * Scale shape: state is ONE (n, mean, M2) triple per event type —
  * O(|types|), independent of stream length; the state store shards
  * by type hash. No timeout is registered because the state is a
  * per-type constant-size summary, not per-entity growth (unlike
  * sessionization) — a type that goes quiet costs 3 numbers.
  * Within a micro-batch, events fold in (t, value) order so the
  * scoring is deterministic under arrival reordering inside a batch.
  */
object StreamAnomaly {

  final case class Flagged(event_type: String, t: Long, value: Double, z: Double)
  final case class RunningStats(n: Long, mean: Double, m2: Double)

  /** `events` must carry (event_type: String, t: Long, value: Double).
    * Emits flagged rows in append mode; burn-in: a type's first
    * `minN` observations train silently.
    */
  def zscores(
      events: DataFrame,
      minN: Long = 30L,
      threshold: Double = 3.0): Dataset[Flagged] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .as[(String, Long, Double)](Encoders.tuple(
        Encoders.STRING, Encoders.scalaLong, Encoders.scalaDouble))
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        processType(minN, threshold))
  }

  private def processType(minN: Long, k: Double)(
      etype: String,
      rows: Iterator[(String, Long, Double)],
      state: GroupState[RunningStats]): Iterator[Flagged] = {
    var st = state.getOption.getOrElse(RunningStats(0L, 0.0, 0.0))
    val out = Seq.newBuilder[Flagged]
    rows.toArray.sortBy(r => (r._2, r._3)).foreach { case (_, t, v) =>
      if (st.n >= minN && st.n > 1) {
        val sd = math.sqrt(st.m2 / (st.n - 1))
        if (sd > 0.0) {
          val z = (v - st.mean) / sd
          if (math.abs(z) >= k) out += Flagged(etype, t, v, z)
        }
      }
      val n1 = st.n + 1
      val d = v - st.mean
      val mean1 = st.mean + d / n1
      st = RunningStats(n1, mean1, st.m2 + d * (v - mean1))
    }
    state.update(st)
    out.result().iterator
  }
}
