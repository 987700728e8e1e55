package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.events.HeavyHitters.MgSummary

/** Streaming heavy hitters — the unbounded-stream twin of the batch
  * [[graft.events.HeavyHitters]]: a weighted Misra–Gries summary held
  * in keyed state, O(buckets · capacity) TOTAL regardless of how many
  * distinct keys the stream ever carries (the whole point: exact
  * streaming counts would grow state with key cardinality, which an
  * infinite firehose forbids).
  *
  * Sharding: keys hash into `buckets` state shards; each shard owns
  * one capacity-bounded summary, so the per-trigger fold
  * parallelizes and no shard's map exceeds `capacity` entries. Each
  * trigger emits the shard's full entry list (update mode): key,
  * guaranteed count `count_lo`, and the shard's cumulative decrement
  * total `err` — the same certainty contract as the batch op
  * (true ∈ [count_lo, count_lo + err]; an unreported key of the same
  * shard carries ≤ err). A bucket's keys never move shards, so
  * cross-shard merging at read time is a plain group-by: lo sums,
  * err sums — pinned in `StreamHeavyHittersSpec`.
  *
  * Within a micro-batch, rows fold in (key, weight) sorted order so
  * the summary — and therefore the emitted bounds — are deterministic
  * under arrival reordering inside a batch.
  */
object StreamHeavyHitters {

  final case class ShardTop(bucket: Int, key: String, count_lo: Long, err: Long)
  final case class MgState(keys: Array[String], counts: Array[Long], dec: Long)

  /** `rows` must carry (key: String, weight: Long). */
  def heavyHitters(
      rows: DataFrame,
      capacity: Int,
      buckets: Int = 64): Dataset[ShardTop] = {
    require(buckets >= 1, "buckets must be positive")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .as[(String, Long)](Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .groupByKey { case (k, _) => math.floorMod(k.##, buckets) }
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        processShard(capacity))
  }

  private def processShard(capacity: Int)(
      bucket: Int,
      rows: Iterator[(String, Long)],
      state: GroupState[MgState]): Iterator[ShardTop] = {
    val s = new MgSummary(capacity)
    state.getOption.foreach { st =>
      var i = 0
      while (i < st.keys.length) { s.add(st.keys(i), st.counts(i)); i += 1 }
      s.addDecremented(st.dec)
    }
    rows.toArray.sortBy(identity).foreach { case (k, w) => s.add(k, w) }
    val es = s.entries
    state.update(MgState(es.map(_._1), es.map(_._2), s.decremented))
    es.iterator.map { case (k, c) => ShardTop(bucket, k, c, s.decremented) }
  }
}
