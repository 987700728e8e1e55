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
    // null keys drop, like the batch twin's partitionSummaries guard
    // (and sortBy on a null key would NPE before `add` could skip it)
    rows.filter(_._1 != null).toArray.sortBy(identity)
      .foreach { case (k, w) => s.add(k, w) }
    val es = s.entries
    state.update(MgState(es.map(_._1), es.map(_._2), s.decremented))
    es.iterator.map { case (k, c) => ShardTop(bucket, k, c, s.decremented) }
  }

  // ------------------------------------------------------------------
  // Time-decayed variant — "top talkers, recent-past weighted"
  // ------------------------------------------------------------------

  /** Decayed shard emission: counts/err are normalized to `as_of` —
    * the SHARD's max event time seen, which differs across shards
    * (one shard's newest event may be far older than another's).
    * Rows from the SAME shard compare directly; before ranking across
    * shards, rescale to a common instant with [[comparable]] —
    * comparing raw rows across shards would misrank by
    * `2^(Δas_of/halfLife)`. `true decayed weight ∈
    * [count_lo, count_lo + err]` exactly as in the undecayed op, just
    * under the exponential-decay measure.
    */
  final case class DecayedTop(
      bucket: Int, key: String, count_lo: Double, err: Double, as_of: Long)

  /** Rescale a collected emission set to ONE instant (the max
    * `as_of` present) so rows from different shards rank against
    * each other correctly. Pure driver-side arithmetic over the
    * ≤ buckets·capacity reported rows.
    */
  def comparable(rows: Seq[DecayedTop], halfLifeSec: Double): Seq[DecayedTop] = {
    if (rows.isEmpty) return rows
    val asOf = rows.map(_.as_of).max
    rows.map { r =>
      val down = math.pow(2.0, -((asOf - r.as_of) / halfLifeSec))
      r.copy(count_lo = r.count_lo * down, err = r.err * down, as_of = asOf)
    }
  }

  final case class DecayedState(
      keys: Array[String], counts: Array[Double], dec: Double,
      landmark: Double, maxT: Long)

  /** Exponentially-decayed heavy hitters over (key, weight, eventSec)
    * rows: a row observed Δt seconds before the read instant
    * contributes `weight · 2^(-Δt/halfLifeSec)`. Implemented with
    * FORWARD decay (Cormode, Shkapenyuk, Srivastava & Xu 2009): each
    * shard stores counts scaled as `w · 2^((t − landmark)/halfLife)`
    * — monotone in t, so arrivals only ever ADD weight and the state
    * never needs rescanning on reads; emission divides by
    * `2^((maxT − landmark)/halfLife)` once. When the exponent drifts
    * past [[RenormExponent]] the shard renormalizes (multiply every
    * counter by a power of two and advance the landmark — exact in
    * binary floating point, so renormalization does NOT perturb the
    * result). The weighted-MG bound survives unchanged because decay
    * is just a per-row positive weight in the forward domain.
    *
    * State: O(buckets · capacity) doubles — same bound as the
    * undecayed op; determinism: rows fold in (t, key, weight) order.
    */
  def decayed(
      rows: DataFrame,
      halfLifeSec: Double,
      capacity: Int,
      buckets: Int = 64): Dataset[DecayedTop] = {
    require(buckets >= 1, "buckets must be positive")
    require(halfLifeSec > 0, "halfLifeSec must be positive")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .as[(String, Double, Long)](Encoders.tuple(
        Encoders.STRING, Encoders.scalaDouble, Encoders.scalaLong))
      .groupByKey { case (k, _, _) => math.floorMod(k.##, buckets) }
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        processDecayed(halfLifeSec, capacity))
  }

  /** Forward-scaled exponent ceiling before a shard renormalizes —
    * far below the ~1023 overflow bound, far above any single batch's
    * time span at sane half-lives.
    */
  val RenormExponent: Double = 512.0

  private def processDecayed(halfLife: Double, capacity: Int)(
      bucket: Int,
      rows: Iterator[(String, Double, Long)],
      state: GroupState[DecayedState]): Iterator[DecayedTop] = {
    val batch = rows.filter(_._1 != null).toArray
      .sortBy { case (k, w, t) => (t, k, w) }
    var st = state.getOption.getOrElse(
      DecayedState(Array.empty, Array.empty, 0.0,
        landmark = if (batch.nonEmpty) batch.head._3.toDouble else 0.0,
        maxT = Long.MinValue))
    // renormalize BEFORE folding if this batch would push the forward
    // exponent past the ceiling: scale every counter down by an EXACT
    // power of two (scalb — no rounding) and advance the landmark by
    // the matching whole number of half-lives, so renormalization
    // cannot perturb any decayed value
    val batchMax = if (batch.nonEmpty) batch.map(_._3).max else st.maxT
    if (batch.nonEmpty && (batchMax - st.landmark) / halfLife > RenormExponent) {
      val shift = math.floor((batchMax - st.landmark) / halfLife).toInt
      val scale = java.lang.Math.scalb(1.0, -shift)
      st = DecayedState(st.keys, st.counts.map(_ * scale), st.dec * scale,
        landmark = st.landmark + shift * halfLife, maxT = st.maxT)
    }
    val s = new MgSummaryD(capacity)
    var i = 0
    while (i < st.keys.length) { s.add(st.keys(i), st.counts(i)); i += 1 }
    s.addDecremented(st.dec)
    batch.foreach { case (k, w, t) =>
      s.add(k, w * math.pow(2.0, (t - st.landmark) / halfLife))
    }
    val maxT = math.max(st.maxT, batchMax)
    val es = s.entries
    state.update(DecayedState(es.map(_._1), es.map(_._2), s.decremented,
      st.landmark, maxT))
    val down = math.pow(2.0, -((maxT - st.landmark) / halfLife))
    es.iterator.map { case (k, c) =>
      DecayedTop(bucket, k, c * down, s.decremented * down, maxT)
    }
  }

  /** Double-weighted Misra–Gries — the forward-decay twin of
    * [[graft.events.HeavyHitters.MgSummary]]: same capacity-bounded
    * fold, same shed-the-minimum overflow step, same
    * [count, count + decremented] certainty contract, with real
    * weights (decay factors are not integers).
    */
  private final class MgSummaryD(capacity: Int) {
    private val counts = new java.util.HashMap[String, java.lang.Double](capacity * 2)
    private var dec = 0.0

    def decremented: Double = dec
    def addDecremented(d: Double): Unit = dec += d

    def add(key: String, w: Double): Unit = {
      if (w <= 0.0 || key == null) return
      val cur = counts.get(key)
      if (cur != null) {
        counts.put(key, java.lang.Double.valueOf(cur.doubleValue() + w)); return
      }
      counts.put(key, java.lang.Double.valueOf(w))
      while (counts.size > capacity) shedMin()
    }

    private def shedMin(): Unit = {
      var m = Double.MaxValue
      val it0 = counts.values().iterator()
      while (it0.hasNext) { val v = it0.next().doubleValue(); if (v < m) m = v }
      dec += m
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue.doubleValue() - m
        if (nv <= 0.0) it.remove() else e.setValue(java.lang.Double.valueOf(nv))
      }
    }

    def entries: Array[(String, Double)] = {
      val out = new Array[(String, Double)](counts.size)
      var i = 0
      counts.forEach { (k, v) => out(i) = (k, v.doubleValue()); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (String, Double), b: (String, Double)) =>
          a._2 > b._2 || (a._2 == b._2 &&
            graft.llm.Bpe.utf8Ordering.lt(a._1, b._1)))
      out
    }
  }
}
