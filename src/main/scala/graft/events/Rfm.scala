package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Lineage.TruncateOps

/** Distributed exact ranking and RFM (recency / frequency / monetary)
  * scoring over an event stream.
  *
  * A naive `ntile(n) OVER (ORDER BY …)` is the canonical
  * does-not-scale plan: a window with no partition key moves the
  * whole relation into ONE task. [[ntileExact]] computes the same
  * buckets with the two-phase global-rank shape instead:
  * range-partition on the sort key, count per range (map-side
  * partials, `buckets` rows out), window the tiny per-range counts
  * into rank offsets, then row-number WITHIN each balanced range and
  * add the offset — an exact 1-based global row number at any scale.
  * The ntile bucket is then arithmetic on (rank, total): SQL ntile
  * gives the first `total mod n` buckets one extra row, i.e. with
  * `s = total / n` and `thr = (total mod n) · (s+1)`:
  * `rank ≤ thr → (rank−1)/(s+1) + 1`, else
  * `(total mod n) + (rank−thr−1)/s + 1` — verified against the SQL
  * `ntile` in both Spark and DuckDB by the spec.
  *
  * Callers must pass a TOTAL order (break value ties with a unique
  * id): ntile on a partial order is nondeterministic in any engine.
  */
object Rfm {

  /** Append `rankCol` (exact 1-based global row number in `sort`
    * order) and `bucketCol` (its n-tile) to `df`.
    */
  def ntileExact(
      df: DataFrame,
      n: Int,
      sort: Seq[Column],
      rankCol: String = "rank",
      bucketCol: String = "bucket",
      buckets: Int = 32): DataFrame = {
    require(n > 0, "ntile needs n > 0")
    val ranged = df
      .repartitionByRange(buckets, sort: _*)
      .withColumn("__pid", spark_partition_id())
      .truncateLineage()
    val offsets = ranged.groupBy("__pid").agg(count(lit(1)).as("__pn"))
      .withColumn("__off",
        coalesce(sum("__pn").over(
          Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__total", sum("__pn").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("__pid", "__off", "__total")
    val rank = col("__off") +
      row_number().over(Window.partitionBy("__pid").orderBy(sort: _*))
    val s = (col("__total") / n).cast("long")
    val r0 = col("__total") % n
    val thr = r0 * (s + 1)
    val bucket = when(col(rankCol) <= thr, (col(rankCol) - 1) / (s + 1) + 1)
      .otherwise(r0 + (col(rankCol) - thr - 1) / s + 1)
    ranged
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(rankCol, rank)
      .withColumn(bucketCol, bucket.cast("long"))
      .drop("__pid", "__off", "__total")
  }

  /** Exact 1-based rank WITHIN each group, plus the group's total
    * row count — without ever co-locating a whole group. The naive
    * `row_number() OVER (PARTITION BY g ORDER BY …)` serializes a hot
    * group (a 60%-of-corpus language, say) into one task; here the
    * relation range-partitions on (group ++ sort), so a hot group
    * spans consecutive ranges, per-(range, group) counts stay tiny
    * (≤ buckets + distinct-groups rows total, by range contiguity),
    * and the offset/total windows run over that tiny relation keyed
    * on the group. The per-range row_number is keyed on (range id,
    * group) — bounded by the range size whatever the group skew.
    * Offsets join back on (range id ++ group); AQE broadcasts the
    * small side. Pass `groupCols = Nil` for a global rank.
    */
  def rankExactBy(
      df: DataFrame,
      groupCols: Seq[String],
      sort: Seq[Column],
      rankCol: String = "rank",
      totalCol: String = "total",
      buckets: Int = 32): DataFrame = {
    val gcols = groupCols.map(col)
    val ranged = df
      .repartitionByRange(buckets, (gcols ++ sort): _*)
      .withColumn("__pid", spark_partition_id())
      .truncateLineage()
    val perRange = ranged
      .groupBy(col("__pid") +: gcols: _*).agg(count(lit(1)).as("__pn"))
    val wOff = Window.partitionBy(gcols: _*).orderBy("__pid")
    val offsets = perRange
      .withColumn("__off", coalesce(sum("__pn").over(
        wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(totalCol, sum("__pn").over(Window.partitionBy(gcols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__pid") +: gcols :+ col("__off") :+ col(totalCol): _*)
    val rank = col("__off") + row_number().over(
      Window.partitionBy(col("__pid") +: gcols: _*).orderBy(sort: _*))
    ranged.join(offsets, "__pid" +: groupCols)
      .withColumn(rankCol, rank)
      .drop("__pid", "__off")
  }

  /** RFM quintile scoring: per user, last-activity time (recency),
    * event count (frequency) and value sum (monetary), each scored
    * 1..n by [[ntileExact]] ascending — higher score = more recent /
    * more active / higher value. One hash aggregate builds the
    * user-grain relation; each score is a two-phase rank over that
    * slim relation (user-count-sized, never the event stream), tied
    * off by user id for determinism.
    */
  def rfm(
      events: DataFrame,
      userCol: Column,
      timeCol: Column,
      valueCol: Column,
      n: Int = 5): DataFrame = {
    val grain = events
      .groupBy(userCol.as("user_id"))
      .agg(max(timeCol).as("recency"),
        count(lit(1)).as("frequency"),
        round(sum(valueCol), 4).as("monetary"))
      .truncateLineage()
    def score(metric: String, name: String)(df: DataFrame): DataFrame =
      ntileExact(df, n, Seq(col(metric), col("user_id")),
        rankCol = s"__rk_$name", bucketCol = name)
        .drop(s"__rk_$name")
    val scored = score("monetary", "m")(score("frequency", "f")(score("recency", "r")(grain)))
    scored.select(col("user_id"), col("recency"), col("frequency"),
      col("monetary"), col("r"), col("f"), col("m"))
  }
}
