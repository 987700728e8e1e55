package graft.engine

import org.apache.spark.sql.DataFrame

import graft.model.TimeFrame
import graft.rollup.Rules
import graft.sinks.Series
import graft.time.StepMath

/** Long-form render rows → wire [[Series]] — the single response
  * assembly shared by the HTTP surface and the e2e fixture runner
  * (the `ch_response.go:125-170` step): per-(display, target) value
  * arrays on the grid, the per-path step/function resolved with the
  * SAME rule lookup the render ran, whisper-compatible consolidation
  * names, and the literal "any" for appended-empty series
  * (`render/data/ch_response.go:203`).
  */
object SeriesAssembly {

  /** Whisper-compatible consolidation name
    * (`render/data/data.go:53-67`: any→first, anyLast→last).
    */
  def whisperName(aggName: String): String = aggName match {
    case "any"     => "first"
    case "anyLast" => "last"
    case other     => other
  }

  /** The per-path (function, effective step) the render resolved —
    * callers MUST pass the same `now` the render used, or a clock
    * tick across a retention-age boundary reports a step the data
    * wasn't rolled to.
    */
  def perPathMeta(
      paths: Seq[String],
      rules: Rules,
      now: Long,
      tf: TimeFrame,
      consolidateBy: Option[String]): (Map[String, String], Map[String, Long]) = {
    val groups = Render.functionGroups(paths, rules, now, tf, consolidateBy)
    val funcByPath = groups.flatMap(g => g.paths.map(_ -> g.func.name)).toMap
    val stepByPath = groups.flatMap { g =>
      val step = StepMath.aggregatedStep(g.step, tf.from, tf.until, tf.maxDataPoints)
      g.paths.map(_ -> step)
    }.toMap
    (funcByPath, stepByPath)
  }

  /** Collect a renderMulti output (path, target, display_name, time,
    * value) into Series, one per (display, target, path) group.
    */
  def assemble(
      out: DataFrame,
      funcByPath: Map[String, String],
      stepByPath: Map[String, Long]): Seq[Series] = {
    out.select("path", "target", "display_name", "time", "value")
      .collect()
      .groupBy(r => (r.getString(2), r.getString(1), r.getString(0))).toSeq
      .sortBy(_._1)
      .map { case ((display, target, path), rs) =>
        val step = stepByPath(path)
        val byTime = rs.map(r => r.getLong(3) ->
          (if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).sortBy(_._1)
        val values = byTime.map(_._2)
        // a series with no point in the window is the appended-empty
        // synthesis → the literal function "any"
        val fn =
          if (values.forall(_.isNaN)) "any" else whisperName(funcByPath(path))
        Series(
          name = display,
          pathExpression = target,
          function = fn,
          start = byTime.head._1,
          stop = byTime.last._1 + step,
          step = step,
          values = values)
      }
  }

  /** Distributed assembly for the scalable render path: ONE aggregate
    * produces one row PER SERIES (value array pre-sorted in-plan), so
    * the driver materializes only the response itself — never an
    * intermediate path list and never per-point rows. Display-name
    * decode for tagged paths runs on the collected series rows (one
    * per response series — the same cost class as serializing the
    * body). Output order matches [[assemble]]'s (display, target,
    * path) sort.
    */
  def assembleScalable(
      filled: DataFrame,
      meta: DataFrame,
      target: String,
      tagged: Boolean): Seq[Series] = {
    import org.apache.spark.sql.functions._
    val rows = filled
      .join(meta.select("path", "step", "func"), Seq("path"))
      .groupBy(col("path"), col("step"), col("func"))
      .agg(
        sort_array(collect_list(struct(col("time"),
          coalesce(col("value"), lit(Double.NaN)).as("value")))).as("pts"),
        // "present" must exclude stored NaNs too: the classic
        // assemble's all-NaN → "any" check treats them as gaps
        count(when(col("value").isNotNull && !isnan(col("value")), lit(1)))
          .as("n_present"))
      .collect()
    rows.toSeq.map { r =>
      val path = r.getString(0)
      val step = r.getLong(1)
      val pts = r.getSeq[org.apache.spark.sql.Row](3)
      val display = if (tagged) graft.compiler.Tagged.decodePath(path) else path
      // all-gap series are the appended-empty synthesis → literal "any"
      val fn = if (r.getLong(4) == 0L) "any" else whisperName(r.getString(2))
      val series = Series(
        name = display,
        pathExpression = target,
        function = fn,
        start = pts.head.getLong(0),
        stop = pts.last.getLong(0) + step,
        step = step,
        values = pts.map(p => p.getDouble(1)).toArray)
      ((display, target, path), series)
    }.sortBy(_._1).map(_._2)
  }

  /** Convenience: meta + assemble in one call with a single `now`. */
  def collect(
      out: DataFrame,
      targets: Seq[(String, Seq[(String, String)])],
      tf: TimeFrame,
      rules: Rules,
      now: Long,
      consolidateBy: Option[String]): Seq[Series] = {
    val (funcByPath, stepByPath) =
      perPathMeta(targets.flatMap(_._2.map(_._1)).distinct, rules, now, tf, consolidateBy)
    assemble(out, funcByPath, stepByPath)
  }
}
