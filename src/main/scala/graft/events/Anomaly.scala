package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Volume-anomaly detection over an event stream: z-score each
  * (type, hour) count against that type's hourly distribution and
  * keep the outliers. Two hash aggregates (hourly counts, then
  * per-type mean/stddev) and one equi-join back on the type key —
  * map-side partials absorb hot types at every stage; nothing is
  * windowed or collected. The z-score is 4-dp rounded: distributed
  * variance merges in partition order, and the cross-engine wobble
  * (~1e-12 relative) sits far below the rounding boundary.
  */
object Anomaly {

  /** (event_type, window_start, n, z) for hours with |z| ≥
    * `threshold`; a type with zero variance never flags.
    */
  def hourlyZscores(
      events: DataFrame,
      typeCol: Column,
      timeCol: Column,
      windowSec: Long = 3600L,
      threshold: Double = 2.0): DataFrame = {
    val counts = events
      .select(typeCol.as("event_type"), timeCol.as("__t"))
      .groupBy(col("event_type"),
        (col("__t") - pmod(col("__t"), lit(windowSec))).as("window_start"))
      .agg(count(lit(1)).as("n"))
    val stats = counts.groupBy("event_type")
      .agg(avg(col("n")).as("__mean"), stddev_samp(col("n")).as("__sd"))
    counts.join(stats, Seq("event_type"))
      // explicit zero-variance guard (ANSI division would throw); the
      // null z never passes the threshold filter
      .withColumn("z", when(col("__sd") > 0.0,
        round((col("n") - col("__mean")) / col("__sd"), 4)))
      .where(abs(col("z")) >= threshold)
      .select(col("event_type"), col("window_start"), col("n"), col("z"))
  }

  /** Anomalous-hour BURSTS: maximal runs of consecutive flagged
    * windows per type, via the gaps-and-islands rank difference
    * (`window index − row_number`). The island window partitions on
    * the type over the FLAGGED relation only — anomaly-count-sized
    * and bounded by the timeline length, never by the corpus, so a
    * hot event type costs at most (hours in range) rows in one task,
    * unlike a window over the raw event stream. Spikes and dips both
    * flag (|z| ≥ threshold), so a spike adjacent to a dip reads as
    * one anomalous period.
    */
  def bursts(
      events: DataFrame,
      typeCol: Column,
      timeCol: Column,
      windowSec: Long = 3600L,
      threshold: Double = 2.0): DataFrame = {
    val flagged = hourlyZscores(events, typeCol, timeCol, windowSec, threshold)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("window_start")
    flagged
      .withColumn("__isl",
        (col("window_start") / windowSec).cast("long") - row_number().over(w))
      .groupBy(col("event_type"), col("__isl"))
      .agg(min(col("window_start")).as("start_ts"),
        max(col("window_start")).as("end_ts"),
        count(lit(1)).as("n_windows"),
        max(abs(col("z"))).as("peak_absz"))
      .select(col("event_type"), col("start_ts"), col("end_ts"),
        col("n_windows"), col("peak_absz"))
  }

  /** Pearson correlation of hourly volumes for every type pair
    * (ta < tb), over the hours BOTH types are active (inner join on
    * the hour key — the correlation-matrix shape is inherently
    * |types|² but reached through an hour-keyed equi-join, each hour
    * contributing its own pair block, never a relation-level
    * cartesian). 4-dp rounded: Pearson's merge is partition-order
    * dependent at ~1e-12 relative.
    */
  def typeCorrelation(
      events: DataFrame,
      typeCol: Column,
      timeCol: Column,
      windowSec: Long = 3600L): DataFrame = {
    val counts = events
      .select(typeCol.as("t"), timeCol.as("__t"))
      .groupBy(col("t"),
        (col("__t") - pmod(col("__t"), lit(windowSec))).as("h"))
      .agg(count(lit(1)).as("n"))
    val a = counts.select(col("t").as("ta"), col("h"), col("n").as("na"))
    val b = counts.select(col("t").as("tb"), col("h"), col("n").as("nb"))
    a.join(b, Seq("h")).where(col("ta") < col("tb"))
      .groupBy("ta", "tb")
      .agg(count(lit(1)).as("n_hours"),
        round(corr(col("na"), col("nb")), 4).as("r"))
  }
}
