package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Write-time data layout beyond partitioning/bucketing: Z-order
  * clustering. Sorting files by the Morton code of two predicate
  * columns gives every file a tight min/max envelope in BOTH
  * dimensions, so parquet footer stats skip files for filters on
  * either column — the layout analogue of the reference's reversed
  * `tag1` ordering (SURVEY §2's deferred layout-tuning item). The
  * cost is one range exchange at write time; reads are unchanged
  * (plain parquet).
  */
object Layout {

  /** Write `df` as parquet clustered by the Z-order of `(colA, colB)`
    * (both rescaled to non-negative via the provided offsets if
    * needed — callers with negative domains shift first).
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: Column,
      colB: Column,
      numFiles: Int,
      bits: Int = 21): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    df.withColumn("__z", ZOrder.zorder(colA, colB, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
