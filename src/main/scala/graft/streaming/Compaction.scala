package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.rollup.Rules

/** Retention compaction — the GraphiteMergeTree background-merge
  * analog (SURVEY §2.9 TTL row): periodically rewrite stored points
  * onto their retention grid. Each row resolves its own (precision,
  * function) from the rules at its age; duplicate writes dedup by
  * version first (ReplacingMergeTree), then buckets aggregate.
  *
  * Read-time rollup stays in the query path (matching the reference,
  * whose client-side rollup runs regardless of merge state), so
  * compaction is purely a storage-size optimization — running it must
  * not change query results, which is what the spec asserts.
  *
  * One plan, two hash aggregates, partition-pruned by date when run
  * incrementally over old partitions — no driver involvement.
  */
object Compaction {

  def compact(points: DataFrame, rules: Rules, now: Long): DataFrame = {
    val age = greatest(lit(0L), lit(now) - col("time"))
    val (precCol, fnCol) = rules.lookupColumnsByAge(col("path"), age)
    val deduped = points
      .withColumn("prec", precCol)
      .withColumn("fn", fnCol)
      .groupBy(col("path"), col("prec"), col("fn"), col("time"))
      .agg(
        max_by(col("value"), struct(col("version"), col("value"))).as("value"),
        max(col("version")).as("version"))
    val bucket = (col("time") - pmod(col("time"), col("prec"))).as("time")
    deduped
      .groupBy(col("path"), col("prec"), col("fn"), bucket)
      .agg(
        avg(col("value")).as("v_avg"),
        sum(col("value")).as("v_sum"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"),
        min_by(col("value"), col("time")).as("v_any"),
        max_by(col("value"), col("time")).as("v_anylast"),
        max(col("version")).as("version"))
      .select(
        col("path"),
        col("time"),
        when(col("fn") === "avg", col("v_avg"))
          .when(col("fn") === "sum", col("v_sum"))
          .when(col("fn") === "min", col("v_min"))
          .when(col("fn") === "max", col("v_max"))
          .when(col("fn") === "any", col("v_any"))
          .when(col("fn") === "anyLast", col("v_anylast"))
          .as("value"),
        to_date(timestamp_seconds(col("time"))).as("date"),
        col("version"))
  }
}
