package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** One output series on the regular grid: `values(i)` is the bucket at
  * `start + i*step`; NaN marks an absent point (the reference's
  * sentinel, `helper/point/func.go:100,111`).
  */
final case class Series(
    name: String,
    pathExpression: String,
    function: String,
    start: Long,
    stop: Long,
    step: Long,
    values: Array[Double])

/** Series assembly: turn the long-form render result (path, time,
  * value rows on the regular grid) into per-series value arrays.
  *
  * The heavy work — one `collect_list` aggregation per series — runs
  * distributed; only the final (find-result-sized × maxDataPoints-
  * bounded) series rows are collected for wire serialization, exactly
  * where the reference materializes its response
  * (`render/data/ch_response.go:30-228`).
  */
object Sinks {

  /** Per-series array assembly as a DataFrame:
    * (path[, display_name, target], start, stop, step, values).
    * Input must be gap-filled (every grid bucket present, nulls for
    * absent); ordering is pinned by sorting the (time, value) structs.
    */
  def seriesFrame(gapFilled: DataFrame, step: Long): DataFrame = {
    val keyCols = gapFilled.columns.filter(c => c != "time" && c != "value").toSeq
    val sorted = array_sort(collect_list(struct(col("time"), col("value"))))
    gapFilled
      .groupBy(keyCols.map(col): _*)
      .agg(
        min(col("time")).as("start"),
        (max(col("time")) + step).as("stop"),
        lit(step).as("step"),
        transform(sorted, e => e.getField("value")).as("values"))
  }

  /** Collect a seriesFrame into wire-ready Series (driver-side; the
    * result is response-sized). Absent points (nulls) become NaN.
    */
  def collectSeries(
      frame: DataFrame,
      function: String = "avg",
      pathExpression: String = ""): Seq[Series] = {
    val hasDisplay = frame.columns.contains("display_name")
    val hasTarget = frame.columns.contains("target")
    frame.collect().toSeq.map { r =>
      def get[T](name: String): T = r.getAs[T](name)
      val values = r.getSeq[Any](r.fieldIndex("values"))
        .map(v => if (v == null) Double.NaN else v.asInstanceOf[Double]).toArray
      Series(
        name = if (hasDisplay) get[String]("display_name") else get[String]("path"),
        pathExpression =
          if (hasTarget) get[String]("target")
          else if (pathExpression.nonEmpty) pathExpression
          else get[String]("path"),
        function = function,
        start = get[Long]("start"),
        stop = get[Long]("stop"),
        step = get[Long]("step"),
        values = values)
    }
  }
}
