package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.events.Rfm

/** Exact global quantiles at corpus scale. `percentile_cont`-style
  * linear interpolation over the EXACT ranked relation — computed
  * with the two-phase rank (range partition → per-range counts →
  * broadcast offsets, [[Rfm.ntileExact]]), never a single-task
  * global sort and never an approximation sketch. The wanted ranks
  * (2 per quantile) broadcast back onto the ranked relation as an
  * equi-join, so the corpus is scanned once and shuffled once.
  *
  * Rank assignment among equal values is partition-order dependent,
  * but the VALUE at every rank position is deterministic — exactly
  * what interpolation consumes.
  */
object Quantiles {

  /** (q, value) for each requested quantile, 4-dp rounded. */
  def exactQuantiles(
      df: DataFrame,
      valueCol: Column,
      qs: Seq[Double],
      buckets: Int = 32): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be within [0, 1]")
    val vals = df.select(valueCol.cast("double").as("v"))
    val ranked = Rfm.ntileExact(vals, 1, Seq(col("v")), buckets = buckets)
      .select(col("v"), col("rank"))
    val total = ranked.groupBy().agg(max(col("rank")).as("__nv"))
    val targets = total
      .select(explode(array(qs.map(lit): _*)).as("q"), col("__nv"))
      .withColumn("__pos", (col("__nv") - 1).cast("double") * col("q"))
      .withColumn("__lo", floor(col("__pos")).cast("long") + 1)
      .withColumn("__hi", least(col("__lo") + 1, col("__nv")))
      .withColumn("__frac", col("__pos") - floor(col("__pos")))
    val wanted = targets.select(col("q"), col("__lo"), col("__hi"),
      col("__frac"), explode(array(col("__lo"), col("__hi"))).as("rank"))
    ranked.join(broadcast(wanted), Seq("rank"))
      .groupBy("q", "__lo", "__hi", "__frac")
      .agg(min(when(col("rank") === col("__lo"), col("v"))).as("__vlo"),
        min(when(col("rank") === col("__hi"), col("v"))).as("__vhi"))
      .select(col("q"),
        round(col("__vlo") + col("__frac") * (col("__vhi") - col("__vlo")), 4)
          .as("value"))
  }

  /** Per-GROUP exact quantiles: (group, q, value) rows. Ranks come
    * from the grouped two-phase rank ([[Rfm.rankExactBy]]) — a
    * 60%-hot group never serializes into one task the way a
    * `PARTITION BY group` window would. The wanted-rank relation is
    * groups × |qs| × 2 rows and equi-joins back on (group, rank);
    * AQE broadcasts it while it fits and shuffles it when the group
    * cardinality outgrows that.
    */
  def exactQuantilesBy(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      qs: Seq[Double],
      buckets: Int = 32): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be within [0, 1]")
    val vals = df.select(col(groupCol), valueCol.cast("double").as("v"))
    val ranked = Rfm.rankExactBy(vals, Seq(groupCol), Seq(col("v")),
      rankCol = "rank", totalCol = "__nv", buckets = buckets)
    val totals = ranked.select(col(groupCol), col("__nv")).distinct()
    val targets = totals
      .select(col(groupCol), explode(array(qs.map(lit): _*)).as("q"), col("__nv"))
      .withColumn("__pos", (col("__nv") - 1).cast("double") * col("q"))
      .withColumn("__lo", floor(col("__pos")).cast("long") + 1)
      .withColumn("__hi", least(col("__lo") + 1, col("__nv")))
      .withColumn("__frac", col("__pos") - floor(col("__pos")))
    val wanted = targets.select(col(groupCol), col("q"), col("__lo"),
      col("__hi"), col("__frac"), explode(array(col("__lo"), col("__hi"))).as("rank"))
    ranked.join(wanted, Seq(groupCol, "rank"))
      .groupBy(col(groupCol), col("q"), col("__lo"), col("__hi"), col("__frac"))
      .agg(min(when(col("rank") === col("__lo"), col("v"))).as("__vlo"),
        min(when(col("rank") === col("__hi"), col("v"))).as("__vhi"))
      .select(col(groupCol), col("q"),
        round(col("__vlo") + col("__frac") * (col("__vhi") - col("__vlo")), 4)
          .as("value"))
  }
}
