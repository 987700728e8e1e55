package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — "which points fall inside which
  * intervals" — done scale-correctly. The naive
  * `points JOIN intervals ON t BETWEEN start AND end` is a theta
  * join: Spark executes it as a broadcast nested loop (or worse, a
  * cartesian) and scores |points|·|intervals| pairs. Here both sides
  * key onto fixed time buckets first — each interval explodes IN-ROW
  * to the buckets it overlaps (bounded by interval length / bucket),
  * each point to exactly one — and the join becomes a plain
  * equi-join on (keys…, bucket) with the exact BETWEEN as a residual
  * filter. AQE skew-splits a hot bucket like any other hash join.
  * Size `bucketSec` near the typical interval length: larger buckets
  * mean fewer interval replicas, smaller buckets a tighter
  * pre-filter.
  */
object Intervals {

  /** Points enriched with the interval(s) containing them (inner
    * join: points outside every interval drop; a point inside
    * overlapping intervals matches each). `startCol`/`endCol` are
    * inclusive epoch seconds.
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      startCol: String,
      endCol: String,
      bucketSec: Long = 3600L): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val ks = keyCols.map(col)
    val expanded = intervals.withColumn("__b",
      explode(sequence(
        (col(startCol).cast("long") / bucketSec).cast("long"),
        (col(endCol).cast("long") / bucketSec).cast("long"))))
    points
      .withColumn("__b", (col(timeCol).cast("long") / bucketSec).cast("long"))
      .join(expanded, keyCols :+ "__b")
      .where(col(timeCol) >= col(startCol) && col(timeCol) <= col(endCol))
      .drop("__b")
  }
}
