package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped top-k without a group-keyed window. The textbook
  * `row_number().over(Window.partitionBy(group))` serializes a hot
  * group (one event type carrying 90% of the rows) into a single
  * task with no partial aggregation and no AQE skew relief — the
  * same failure mode the capped inverted index avoids for stop-word
  * postings (`TextStats.invertedIndex`). This is the ORDERED variant
  * of that salted two-stage shape: stage 1 keeps the k best rows
  * within each of `salts` hash buckets of the id (every group is
  * bounded by its bucket's share), stage 2 merges ≤ `salts`·k
  * candidates per group. Both stages are hash aggregates with
  * map-side partials; the final rank is a `posexplode` over k
  * elements, never a window over the group key.
  */
object TopK {

  /** Per-group top-k rows by `valueCol` DESC, ties broken by `idCol`
    * ASC — output `(groupCols…, rank, <idName>, <valueName>)`.
    * Deterministic as long as (value, id) pairs are distinct per
    * group, which `idCol` being a key guarantees. Size `salts` so a
    * worst-case stage-1 buffer (group rows / salts) fits an executor;
    * stage 2 merges ≤ salts·k rows per group.
    */
  def topKBy(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: Column,
      valueCol: Column,
      k: Int,
      idName: String = "id",
      valueName: String = "value",
      salts: Int = 256): DataFrame = {
    require(k >= 1, "k must be positive")
    val gs = groupCols.map(col)
    // ascending struct sort == (value DESC, id ASC): negate the value
    val item = struct((-valueCol.cast("double")).as("nv"), idCol.as("id"))
    val stage1 = df
      .groupBy(gs :+ pmod(hash(idCol), lit(salts)).as("__salt"): _*)
      .agg(slice(array_sort(collect_list(item)), 1, k).as("__top"))
    stage1
      .groupBy(gs: _*)
      .agg(slice(array_sort(flatten(collect_list(col("__top")))), 1, k).as("__top"))
      .select(gs :+ posexplode(col("__top")): _*)
      .select(gs ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idName),
        // + 0.0 normalizes the -0.0 a double negation leaves behind
        (-col("col.nv") + lit(0.0)).as(valueName)): _*)
  }
}
