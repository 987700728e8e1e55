package graft.prom

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Prometheus → plain-graphite escape hatch
  * (`finder/plain_from_tagged.go:16-124`, wired in
  * `finder/finder.go:123-145`): a matcher set of the shape
  *
  *   graphite{target="telegraf.*.cpu.avg", node1="host", rename="cpu"}
  *
  * routes to the PLAIN metric index — the `target` value is a
  * graphite glob run through the ordinary plain finder — and each
  * found dotted path is re-labeled into a synthetic tagged series:
  * metric name `rename` (default `graphite`), a `metric` label
  * carrying the full path, and one label per `node<N>="<label>"`
  * matcher naming dot-segment N (0-based). This is how a Prometheus
  * user (Grafana) reads legacy dotted metrics through the tagged API
  * without re-ingesting them.
  *
  * Detection requires `__name__="graphite"` (Eq) and a non-empty Eq
  * `target` (`plain_from_tagged.go:23-41`); `rename` and `node<N>`
  * are optional refinements (last assignment wins, non-numeric node
  * suffixes skipped — `:44-63`). Everything else in the matcher set
  * is IGNORED, exactly like the reference (the route replaces tag
  * filtering wholesale).
  */
object PlainFromTagged {
  final case class Route(
      target: String,
      metricName: String,
      nodeLabels: Map[Int, String])

  /** `makePlainFromTagged` (`plain_from_tagged.go:23-66`). */
  def detect(matchers: Seq[(String, String, String)]): Option[Route] = {
    val isGraphite = matchers.exists {
      case ("__name__", "=", "graphite") => true
      case _                             => false
    }
    // last Eq assignment wins, mirroring the reference's loop
    val target = matchers.foldLeft("") {
      case (_, ("target", "=", v)) if v.nonEmpty => v
      case (acc, _)                              => acc
    }
    if (!isGraphite || target.isEmpty) None
    else {
      val rename = matchers.foldLeft("") {
        case (_, ("rename", "=", v)) if v.nonEmpty => v
        case (acc, _)                              => acc
      }
      val nodes = matchers.foldLeft(Map.empty[Int, String]) {
        case (acc, (k, "=", v)) if k.startsWith("node") && v.nonEmpty =>
          k.stripPrefix("node").toIntOption match {
            case Some(n) => acc + (n -> v)
            case None    => acc // non-numeric suffix skipped (`:52-55`)
          }
        case (acc, _) => acc
      }
      Some(Route(target, if (rename.nonEmpty) rename else "graphite", nodes))
    }
  }

  /** Go `url.QueryEscape` for plan-time constants: java's URLEncoder
    * with the two divergent classes fixed (Go escapes `*` → `%2A` and
    * leaves `~` bare; java does the opposite).
    */
  def queryEscape(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
      .replace("*", "%2A").replace("%7E", "~")

  /** The same escaping as a codegen'd column chain (for the
    * path-derived label VALUES, which are not plan-time constants).
    */
  private def queryEscapeCol(c: Column): Column =
    regexp_replace(regexp_replace(url_encode(c), "\\*", "%2A"), "%7E", "~")

  /** `Abs` (`plain_from_tagged.go:85-124`): a found dotted path →
    * its synthetic tagged STORAGE form `name?l1=v1&l2=v2` with the
    * labels sorted by name and query-escaped — the spelling the rest
    * of the engine (label decode, grouping, response assembly)
    * already speaks. Label NAMES are matcher values, so the sort
    * happens at plan time; a `node<N>` beyond the path's depth
    * contributes nothing (`element_at` null, skipped by `concat_ws`
    * — the reference only iterates existing segments).
    */
  def abs(path: Column, route: Route): Column = {
    val parts = split(path, "\\.")
    val entries: Seq[(String, Column)] =
      ("metric", path) +:
        route.nodeLabels.toSeq.sortBy(_._1).map { case (n, label) =>
          // try_: an index past the path's depth is the DEFINED
          // label-contributes-nothing case, not an error (ANSI
          // element_at throws on out-of-bounds)
          (label, try_element_at(parts, lit(n + 1)))
        }
    val kvs = entries.sortBy(_._1).map { case (name, v) =>
      when(v.isNotNull,
        concat(lit(queryEscape(name) + "="), queryEscapeCol(v)))
    }
    concat(lit(route.metricName + "?"), concat_ws("&", kvs: _*))
  }
}
