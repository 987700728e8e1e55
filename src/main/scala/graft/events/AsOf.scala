package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — ClickHouse `ASOF JOIN` semantics, the time-series
  * enrichment primitive Spark lacks natively: each left row picks the
  * single right row with the LARGEST right time ≤ its own time on the
  * same key (backward-inclusive match; unmatched rows keep nulls,
  * like `ASOF LEFT JOIN`).
  *
  * Spark-first shape: tag both relations, union, ONE per-key ordered
  * pass in which every right attribute rides forward via
  * `last(_, ignoreNulls)` to all later left rows — a single shuffle
  * co-partitions both sides on the key, and the window partition is
  * KEY-bounded (one key's own history), the same discipline as
  * sessionization, never corpus-bounded. Beats the
  * sort-merge-inequality alternative (a theta join Spark would
  * execute as a nested loop) and never materializes candidate pairs.
  * For a time-hot key (one key owning a meaningful fraction of all
  * rows) the same union generalizes to the two-phase running-fold:
  * range-bucket the timeline, seed each bucket with the last right
  * row before its start, fold within buckets.
  */
object AsOf {

  /** Left rows enriched with `valueCols` from the right relation
    * as-of `leftTime` (right columns null when no right row precedes;
    * `rightTime` is surfaced as `asof_t`). Right-side value columns
    * must not collide with left column names and are assumed non-null
    * on right rows (the ride-forward uses null as "no value yet").
    * Ties: a right row AT the left row's time matches (inclusive); of
    * several right rows at the same (key, time), the last in
    * (time, `rightTime`) order wins — keep right keys unique per
    * instant.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val ks = keyCols.map(col)
    val leftTagged = left
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__side", lit(1))
      .withColumn("__rt", lit(null).cast("long"))
    val rightTagged = right.select(
      (ks ++ Seq(col(rightTime).cast("long").as("__t"), lit(0).as("__side"),
        col(rightTime).cast("long").as("__rt")) ++ valueCols.map(col)): _*)
    val leftShaped = leftTagged.select(
      (leftTagged.columns.filterNot(c => c == "__t" || c == "__side" || c == "__rt")
        .map(col) ++ Seq(col("__t"), col("__side"), col("__rt"))): _*)
    // align schemas: left side carries null right-values, right side
    // carries null left-only columns
    val leftOnly = left.columns.filterNot(c => keyCols.contains(c))
    val rightAligned = rightTagged.select(
      (ks ++ leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__t"), col("__side"), col("__rt")) ++ valueCols.map(col)): _*)
    val leftAligned = leftShaped.select(
      (ks ++ leftOnly.map(col) ++ Seq(col("__t"), col("__side"), col("__rt")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    // right rows at the same instant sort BEFORE left rows → inclusive
    val w = Window.partitionBy(ks: _*).orderBy(col("__t"), col("__side"), col("__rt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ridden = leftAligned.unionByName(rightAligned)
      .withColumn("asof_t", last(col("__rt"), ignoreNulls = true).over(w))
    val valueRidden = valueCols.foldLeft(ridden) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    valueRidden.where(col("__side") === 1)
      .select((ks ++ leftOnly.map(col) ++ Seq(col("asof_t")) ++
        valueCols.map(col)): _*)
  }

  /** [[asofJoin]] for TIME-HOT keys — one key owning a meaningful
    * fraction of all rows would serialize the plain ride-forward
    * window into a single task. Same semantics, two-phase: (1) per
    * (key, time-bucket) the right side collapses to its LAST row — a
    * hash aggregate with map-side partials, skew-immune; (2) that
    * bucket-grain relation (timeline/bucketSec rows per key, bounded
    * by the clock not the corpus) rides forward per key to give every
    * bucket its SEED = the latest right row before the bucket; (3)
    * the final window runs per (key, bucket) — a partition holds one
    * bucket's rows, so the hot key splits across its buckets instead
    * of one task. Equivalence with [[asofJoin]] is pinned in
    * `AsOfSpec`. Pick `bucketSec` so a hot key's densest bucket fits
    * a task.
    */
  def asofJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val ks = keyCols.map(col)
    val leftOnly = left.columns.filterNot(c => keyCols.contains(c))

    // (1) last right row per (key, bucket): max_by on the (rt) order —
    // one hash aggregate, partial-agg collapses a hot bucket map-side
    val rKeyed = right.select(
      (ks ++ Seq(col(rightTime).cast("long").as("__rt")) ++ valueCols.map(col)): _*)
      .withColumn("__bk", (col("__rt") / bucketSec).cast("long"))
    val lastPerBucket = rKeyed
      .groupBy((ks :+ col("__bk")): _*)
      .agg(max(struct((col("__rt") +: valueCols.map(col)): _*)).as("__last"))
    // (2) seeds: EVERY bucket that appears on either side (a bucket
    // holding only left rows still needs the latest right row from
    // before it) gets seed = max over earlier buckets' last rows. The
    // window partitions per key over the bucket GRAIN (timeline-
    // bounded), not the row grain.
    val leftBuckets = left
      .select((ks :+ (col(leftTime).cast("long") / bucketSec).cast("long").as("__bk")): _*)
      .distinct()
    val allBuckets = leftBuckets
      .unionByName(lastPerBucket.select((ks :+ col("__bk")): _*))
      .distinct()
    val wSeed = org.apache.spark.sql.expressions.Window
      .partitionBy(ks: _*).orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val seeds = allBuckets
      .join(lastPerBucket, keyCols :+ "__bk", "left")
      .withColumn("__seed", max(col("__last")).over(wSeed))
      .where(col("__seed").isNotNull)
      .select((ks ++ Seq(col("__bk"), col("__seed"))): _*)

    // (3) per-(key, bucket) union: seed (sorts first), right rows,
    // left rows — the ride-forward window partition is one bucket
    val rightRows = rKeyed.select(
      (ks ++ Seq(col("__bk"), col("__rt").as("__t"), lit(0).as("__side"),
        col("__rt")) ++ valueCols.map(col)): _*)
    val seedRows = seeds.select(
      (ks ++ Seq(col("__bk"), lit(Long.MinValue).as("__t"), lit(-1).as("__side"),
        col("__seed.__rt").as("__rt")) ++
        valueCols.map(c => col(s"__seed.$c").as(c))): _*)
    val leftRows = left
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__bk", (col("__t") / bucketSec).cast("long"))
      .select((ks ++ Seq(col("__bk"), col("__t"), lit(1).as("__side"),
        lit(null).cast("long").as("__rt")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftOnly.map(col)): _*)
    val rightAligned = rightRows
      .select((rightRows.columns.map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val seedAligned = seedRows
      .select((seedRows.columns.map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((ks :+ col("__bk")): _*)
      .orderBy(col("__t"), col("__side"), col("__rt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ridden = leftRows.unionByName(rightAligned).unionByName(seedAligned)
      .withColumn("asof_t", last(col("__rt"), ignoreNulls = true).over(w))
    val valueRidden = valueCols.foldLeft(ridden) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    valueRidden.where(col("__side") === 1)
      .select((ks ++ leftOnly.map(col) ++ Seq(col("asof_t")) ++
        valueCols.map(col)): _*)
  }
}
