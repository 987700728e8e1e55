package graft.api

import java.time.{Duration, Instant, ZoneId}

import graft.model.TimeFrame
import graft.time.TimeGrammar

/** Render/find request parsing — the `ParseRequest → MultiTarget`
  * step of the query lifecycle (SURVEY §3.1;
  * `render/reply/formatter.go:53-95` form parsing +
  * `render/data/multi_target.go:30-54`): raw `target`/`from`/`until`/
  * `maxDataPoints` parameters through the graphite time grammar into
  * the engine's request model. Targets sharing a (from, until) window
  * group into one TimeFrame, exactly like the reference's
  * `MultiTarget` map.
  */
object Request {

  final case class RenderRequest(frames: Seq[(TimeFrame, Seq[String])])

  val DefaultMaxDataPoints = 1048576L // `config/config.go:260`

  def parseRender(
      targets: Seq[String],
      from: String,
      until: String,
      maxDataPoints: Option[Long] = None,
      now: Instant = Instant.now(),
      tz: ZoneId = ZoneId.of("UTC"),
      truncate: Duration = Duration.ZERO): Either[String, RenderRequest] = {
    if (targets.isEmpty) return Left("no targets")
    val f = TimeGrammar.parse(from, tz, now, truncate)
    val u = TimeGrammar.parse(until, tz, now, truncate)
    if (f == 0 && from.nonEmpty) return Left(s"invalid from: $from")
    if (u == 0 && until.nonEmpty) return Left(s"invalid until: $until")
    val fromTs = if (f == 0) now.getEpochSecond - 86400 else f
    val untilTs = if (u == 0) now.getEpochSecond else u
    if (untilTs < fromTs) return Left("until < from")
    val tf = TimeFrame(fromTs, untilTs, maxDataPoints.getOrElse(DefaultMaxDataPoints))
    Right(RenderRequest(Seq(tf -> targets)))
  }

  /** Multi-window form (carbonapi v3 pb: per-metric start/stop/mdp):
    * group targets by identical (from, until, maxDataPoints).
    */
  def fromV3(metrics: Seq[(String, Long, Long, Long)]): RenderRequest =
    RenderRequest(
      metrics
        .groupBy { case (_, f, u, m) => (f, u, m) }
        .toSeq
        .sortBy(_._1)
        .map { case ((f, u, m), ms) =>
          TimeFrame(f, u, if (m > 0) m else DefaultMaxDataPoints) -> ms.map(_._1)
        })
}
