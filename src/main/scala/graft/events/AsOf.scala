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
}
