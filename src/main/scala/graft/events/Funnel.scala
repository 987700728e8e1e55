package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream — the
  * conversion-path query (view → click → purchase): for each user,
  * the first time of step 1, the first step-2 event STRICTLY after
  * it, and the first step-3 event strictly after that.
  *
  * Shape: one hash aggregate per user collects the (t, step) pairs,
  * then a SEQUENTIAL fold over the time-sorted bounded list walks the
  * funnel — no self-joins (the classic tA < tB < tC triple-join
  * squares the event table), no window over the full stream, state
  * bounded by one user's events. `windowSec` bounds each conversion
  * step (first-touch attribution: the funnel stalls if the FIRST
  * step-1 event converts late, it does not retry later step-1
  * events — the classic strict-first-touch contract). Events sort by
  * (t, step code) so
  * simultaneous events resolve deterministically; a later-step event
  * at the exact timestamp of its predecessor does NOT count (strict
  * progression).
  */
object Funnel {

  /** `steps` are the ordered event types of the funnel. Returns
    * (user_id, t_step1.., stage) with NULL times for unreached steps
    * and `stage` = number of steps completed. Currently fixed to
    * 3-step funnels — the common depth; the fold generalizes.
    */
  def funnel3(
      events: DataFrame,
      steps: Seq[String],
      userCol: Column,
      typeCol: Column,
      timeCol: Column,
      windowSec: Long = Long.MaxValue): DataFrame = {
    require(steps.size == 3, "funnel3 takes exactly 3 ordered steps")
    require(windowSec > 0, "windowSec must be positive")
    // step codes keep (t, code) sort order deterministic and
    // engine-portable regardless of type-string ordering
    val code = when(typeCol === steps(0), 1)
      .when(typeCol === steps(1), 2)
      .when(typeCol === steps(2), 3)
      .otherwise(0)
    val acc0 = struct(lit(-1L).as("a"), lit(-1L).as("b"), lit(-1L).as("c"))
    val folded = events
      .select(userCol.as("user_id"), timeCol.cast("long").as("t"),
        code.as("step"))
      .where(col("step") > 0)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("t"), col("step")))).as("evs"))
      .select(col("user_id"), aggregate(col("evs"), acc0, (acc, e) => {
        val (t, s) = (e.getField("t"), e.getField("step"))
        val a = when(acc.getField("a") === -1L && s === 1, t)
          .otherwise(acc.getField("a"))
        // each stage gates on the PRE-update predecessor: a step-2
        // event in the same fold step as its step-1 event (same
        // timestamp) must not complete two stages at once
        val b = when(acc.getField("a") =!= -1L && acc.getField("b") === -1L &&
            s === 2 && t > acc.getField("a") &&
            t - acc.getField("a") <= windowSec, t)
          .otherwise(acc.getField("b"))
        val c = when(acc.getField("b") =!= -1L && acc.getField("c") === -1L &&
            s === 3 && t > acc.getField("b") &&
            t - acc.getField("b") <= windowSec, t)
          .otherwise(acc.getField("c"))
        struct(a.as("a"), b.as("b"), c.as("c"))
      }).as("f"))
    def t(field: String) = {
      val v = col("f").getField(field)
      when(v === -1L, lit(null).cast("long")).otherwise(v)
    }
    folded.select(col("user_id"),
      t("a").as(s"t_${steps(0)}"),
      t("b").as(s"t_${steps(1)}"),
      t("c").as(s"t_${steps(2)}"),
      ((col("f").getField("a") =!= -1L).cast("int") +
        (col("f").getField("b") =!= -1L).cast("int") +
        (col("f").getField("c") =!= -1L).cast("int")).cast("long").as("stage"))
  }

  /** Cohort retention: users cohort by the period of their FIRST
    * `anchorType` event; a cohort member counts as retained in offset
    * `k` when ANY of their events falls in the k-th period after the
    * cohort period. Returns (cohort, offset, n_users) — the classic
    * retention triangle.
    *
    * Shape: one aggregate finds each user's cohort period, one
    * distinct projection lists (user, active period), and the
    * offset count is a hash aggregate after an equi-join on user —
    * the cohort side is one row per user, so AQE can broadcast or
    * shuffle it; no window over the event stream, no per-period scan.
    */
  def retention(
      events: DataFrame,
      anchorType: String,
      userCol: Column,
      typeCol: Column,
      timeCol: Column,
      periodSec: Long = 604800L): DataFrame = {
    require(periodSec > 0, "periodSec must be positive")
    val period = floor(timeCol.cast("long") / periodSec).cast("long")
    val cohorts = events.where(typeCol === anchorType)
      .groupBy(userCol.as("user_id"))
      .agg(min(period).as("cohort"))
    val active = events
      .select(userCol.as("user_id"), period.as("p")).distinct()
    cohorts.join(active, Seq("user_id"))
      .where(col("p") >= col("cohort"))
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order event-path transition matrix (the Markov-chain view
    * of user journeys): for every consecutive pair of events by the
    * same user, count src→dst transitions and their per-src share.
    *
    * Shape: ONE window over (user, time, event-id) — the partition
    * key is the user id, high-cardinality by construction, so the
    * window parallelizes at any scale (never a window over the
    * low-cardinality event type). The per-src normalization is a
    * second hash aggregate on the result-sized (|types|²) counts
    * joined back — not a window over the hot src key. Ties at the
    * same timestamp order by event id, so the chain is deterministic.
    */
  def transitions(
      events: DataFrame,
      userCol: Column,
      typeCol: Column,
      timeCol: Column,
      idCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
    val pairs = events
      .select(userCol.as("user_id"), typeCol.as("etype"),
        timeCol.as("t"), idCol.as("event_id"))
      .withColumn("next", lead(col("etype"), 1).over(w))
      .where(col("next").isNotNull)
    val counts = pairs
      .groupBy(col("etype").as("src"), col("next").as("dst"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("src").agg(sum("n").as("tot"))
    counts.join(totals, Seq("src"))
      .select(col("src"), col("dst"), col("n"),
        round(col("n").cast("double") / col("tot").cast("double"), 4).as("p"))
  }

  /** DAU / trailing-7-day WAU / stickiness per day. The rolling
    * distinct is NEVER a sliding window over user sets: each (user,
    * active day) row — already deduped by one hash aggregate —
    * fans out to the ≤ 7 window-end days it can serve (a bounded
    * in-row explode, the sliding-window trick `ev_sliding` uses),
    * then a second distinct + count per window end. Two distincts +
    * two counts + one day-keyed equi-join, all map-side-partial
    * friendly; no window functions anywhere.
    */
  def dauWau(
      events: DataFrame,
      userCol: Column,
      timeCol: Column,
      daySec: Long = 86400L): DataFrame = {
    val ud = events
      .select(userCol.as("user_id"), (timeCol / daySec).cast("long").as("day"))
      .distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("wday"))
      .distinct()
      .groupBy("wday").agg(count(lit(1)).as("wau"))
    dau.join(wau, dau("day") === wau("wday"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 4)
          .as("stickiness"))
  }
}
