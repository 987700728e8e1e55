package graft.events

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Lineage.TruncateOps

/** Bounded-memory heavy hitters: the weighted Misra–Gries /
  * SpaceSaving summary (Misra & Gries 1982; Metwally et al. 2005)
  * distributed the mergeable-summaries way (Agarwal et al. 2012).
  *
  * Why not the exact salted top-k ([[TopK.topKBy]])? Exact counting
  * shuffles every distinct key; at 100 TB a key-cardinality-bound
  * aggregate is exactly what a firehose dashboard can't afford. The
  * MG summary is O(capacity) memory PER PARTITION with a global
  * guarantee, no shuffle of the raw keys at all:
  *
  *  - each partition folds its rows into a capacity-bounded counter
  *    map; on overflow the minimum counter value is subtracted from
  *    every counter (evicting zeros) and accumulated into the
  *    partition's decrement total D_p;
  *  - a surviving entry's true in-partition weight lies in
  *    [c, c + D_p]; a key ABSENT from partition p carries ≤ D_p
  *    there. Summing over partitions: true(key) ∈
  *    [count_lo, count_lo + Σ_p D_p] for reported keys, and any
  *    unreported key's true weight is ≤ Σ_p D_p — so every key with
  *    weight above Σ D_p (≤ total/capacity) is guaranteed reported;
  *  - the merge is vocab-sized: ≤ partitions·capacity candidate rows
  *    into one hash aggregate, lineage-cut so the two consumptions
  *    (per-key sums + the global ΣD scalar) never rescan the corpus.
  *
  * With `capacity` ≥ the per-partition distinct-key count the
  * summary never decrements (D_p = 0) and the result is EXACT —
  * which is what puts `ev_heavy_hitters` under the full hash oracle
  * at test SF while the tightness of the bounds under real pressure
  * is pinned by `HeavyHittersSpec`.
  */
object HeavyHitters {

  /** Mergeable weighted Misra–Gries summary. `add` folds one
    * (key, weight) observation; `decremented` is the total weight
    * subtracted by evictions (the summary's error term: any key's
    * true added weight lies in [count, count + decremented], and a
    * key not present has true weight ≤ decremented).
    */
  final class MgSummary(val capacity: Int) extends Serializable {
    require(capacity >= 1, "capacity must be positive")
    private val counts = new java.util.HashMap[String, java.lang.Long](capacity * 2)
    private var dec = 0L

    def decremented: Long = dec
    def size: Int = counts.size

    /** Restore the error term when rebuilding a summary from
      * persisted (entries, decremented) state.
      */
    def addDecremented(d: Long): Unit = dec += d

    def add(key: String, w: Long): Unit = {
      if (w <= 0L || key == null) return
      val cur = counts.get(key)
      if (cur != null) { counts.put(key, java.lang.Long.valueOf(cur.longValue() + w)); return }
      counts.put(key, java.lang.Long.valueOf(w))
      while (counts.size > capacity) shedMin()
    }

    /** Subtract the minimum counter value from every counter and drop
      * zeros — the weighted-MG overflow step. At least the minimum
      * entry evicts, so the `add` loop terminates in one step except
      * when several counters tie at the minimum.
      */
    private def shedMin(): Unit = {
      var m = Long.MaxValue
      val it0 = counts.values().iterator()
      while (it0.hasNext) { val v = it0.next().longValue(); if (v < m) m = v }
      dec += m
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue.longValue() - m
        if (nv <= 0L) it.remove() else e.setValue(java.lang.Long.valueOf(nv))
      }
    }

    /** Fold another summary in (the mergeable-summaries merge): sum
      * counts, then shed back down to capacity; error terms add.
      */
    def merge(other: MgSummary): this.type = {
      other.counts.forEach { (k, v) =>
        val cur = counts.get(k)
        counts.put(k, java.lang.Long.valueOf(
          if (cur == null) v.longValue() else cur.longValue() + v.longValue()))
      }
      dec += other.dec
      while (counts.size > capacity) shedMin()
      this
    }

    /** Entries in deterministic (count desc, key asc UTF-8) order. */
    def entries: Array[(String, Long)] = {
      val out = new Array[(String, Long)](counts.size)
      var i = 0
      counts.forEach { (k, v) => out(i) = (k, v.longValue()); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (String, Long), b: (String, Long)) =>
          a._2 > b._2 || (a._2 == b._2 &&
            graft.llm.Bpe.utf8Ordering.lt(a._1, b._1)))
      out
    }
  }

  private val entrySchema = StructType(Seq(
    StructField("k", StringType, nullable = true),
    StructField("c", LongType, nullable = false),
    StructField("d", LongType, nullable = false)))

  /** Candidate relation: per partition, the summary's entries as
    * (k, c, 0) plus one sentinel row (null, 0, D_p) carrying the
    * partition's decrement total. ≤ partitions·(capacity+1) rows —
    * vocab-sized at any corpus scale.
    */
  private def partitionSummaries(
      df: DataFrame, key: Column, weight: Column, capacity: Int): DataFrame = {
    val pre = df.select(key.cast("string").as("k"), weight.cast("long").as("w"))
    pre.mapPartitions { it =>
      val s = new MgSummary(capacity)
      it.foreach { r =>
        if (!r.isNullAt(0)) s.add(r.getString(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      s.entries.iterator.map { case (k, c) => Row(k, c, 0L) } ++
        Iterator.single(Row(null, 0L, s.decremented))
    }(Encoders.row(entrySchema))
  }

  /** EXACT top-k at key-cardinality-proof memory — the sketch-guided
    * two-pass pattern: pass 1 builds MG candidates (every key with
    * true weight > ΣD_p is guaranteed present, ΣD_p ≤ total/capacity);
    * pass 2 recounts EXACTLY, restricted to the ≤ partitions·capacity
    * candidate keys by a broadcast IN-filter — so the only shuffle is
    * candidate-keyed with map-side partials, never a full
    * distinct-key aggregate. The result is certified: when the k-th
    * recounted weight exceeds ΣD_p, every non-candidate key is
    * provably lighter than rank k and the output IS the true top-k
    * (`certified = true`); otherwise the rows are still exact counts
    * of the heaviest candidates but a non-candidate could in
    * principle outrank the tail (`certified = false` — raise
    * `capacity`). At test SF capacity dominates cardinality and the
    * query sits under the full hash oracle with `certified = true`.
    */
  def exactTopK(
      df: DataFrame, key: Column, weight: Column, k: Int, capacity: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val entries = partitionSummaries(df, key, weight, capacity)
      .truncateLineage(eager = false)
    val totalD = entries.agg(coalesce(sum("d"), lit(0L)))
      .collect()(0).getLong(0)
    // candidate restriction as a broadcast LEFT-SEMI join against the
    // vocab-sized (≤ partitions·capacity) candidate relation — NEVER
    // a driver-collected isin literal list, which at corpus scale
    // would inline millions of literals into the plan
    val candidates = entries.where(col("k").isNotNull).select("k").distinct()
    val exact = df.select(key.cast("string").as("k"), weight.cast("long").as("w"))
      .join(broadcast(candidates), Seq("k"), "left_semi")
      .groupBy("k").agg(sum("w").as("weight"))
    val w = Window.orderBy(col("weight").desc, col("k").asc)
    val top = exact.orderBy(col("weight").desc, col("k").asc).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
    // certified iff no unseen key can crack the ranking: either
    // nothing was ever evicted (candidates = every key), or the
    // output is k-full and its k-th weight beats the eviction mass
    val wAll = Window.partitionBy(lit(1))
    top.withColumn("certified",
      lit(totalD == 0L) ||
        (count(lit(1)).over(wAll) === k &&
          min(col("weight")).over(wAll) > lit(totalD)))
  }

  /** Top-k heavy hitters with deterministic certainty bounds:
    * (k, count_lo, count_hi, rank). `count_lo` ≤ true weight ≤
    * `count_hi` = count_lo + Σ_p D_p; every key with true weight
    * > Σ_p D_p is present in the candidate set. One corpus map pass,
    * one vocab-sized aggregate, no key shuffle.
    */
  def heavyHitters(
      df: DataFrame, key: Column, weight: Column, k: Int, capacity: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val entries = partitionSummaries(df, key, weight, capacity)
      .truncateLineage(eager = false)
    val perKey = entries.where(col("k").isNotNull)
      .groupBy("k").agg(sum("c").as("count_lo"))
    val totalD = entries.agg(coalesce(sum("d"), lit(0L)).as("__totalD"))
    val w = Window.orderBy(col("count_lo").desc, col("k").asc)
    perKey.crossJoin(broadcast(totalD))
      .withColumn("count_hi", col("count_lo") + col("__totalD"))
      .drop("__totalD")
      .orderBy(col("count_lo").desc, col("k").asc).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
  }
}
