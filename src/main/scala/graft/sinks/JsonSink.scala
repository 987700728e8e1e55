package graft.sinks

import java.util.Locale

/** JSON sinks (S9): the reference's hand-built response bodies for
  * render (`render/reply/json.go:22-79`), find
  * (`find/find.go:200-245`) and autocomplete
  * (`autocomplete/autocomplete.go:489-499`).
  */
object JsonSink {

  /** JSON string escape — the single escaper every route shares. */
  def q(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  /** Go's `%f` (6 fixed decimals) used by the reference for values. */
  private def f6(v: Double): String = "%f".formatLocal(Locale.ROOT, v)

  /** Render debug JSON: `{"metrics":[{name, pathExpression,
    * consolidationFunc, startTime, stopTime, stepTime, xFilesFactor,
    * values (null = absent), requestStartTime, requestStopTime}]}` —
    * empty strings omitted, exactly as `json.go:27-70`.
    */
  def render(series: Seq[Series], requestFrom: Long, requestUntil: Long): String = {
    val metrics = series.map { s =>
      val sb = new StringBuilder("{")
      if (s.name.nonEmpty) sb.append("\"name\":").append(q(s.name)).append(',')
      if (s.pathExpression.nonEmpty)
        sb.append("\"pathExpression\":").append(q(s.pathExpression)).append(',')
      if (s.function.nonEmpty)
        sb.append("\"consolidationFunc\":").append(q(s.function)).append(',')
      sb.append(s""""startTime":${s.start},""")
      sb.append(s""""stopTime":${s.stop},""")
      sb.append(s""""stepTime":${s.step},""")
      sb.append(s""""xFilesFactor":${f6(0.0)},""")
      if (s.values.nonEmpty) {
        sb.append("\"values\":[")
        sb.append(s.values.map(v =>
          if (v.isNaN || v.isInfinite) "null" else f6(v)).mkString(","))
        sb.append("],")
      }
      sb.append(s""""requestStartTime":$requestFrom,""")
      sb.append(s""""requestStopTime":$requestUntil""")
      sb.append('}')
      sb.toString
    }
    metrics.mkString("{\"metrics\":[", ",", "]}")
  }

  /** Find response — the reference's (intentionally quirky, non-JSON)
    * `[{path="a.b",leaf=1},{path="a.c."}]` body with trailing CRLF
    * (`find/find.go:200-245`); empty result emits nothing.
    */
  def find(rows: Seq[(String, Boolean)], resultsLimit: Int = 0): String = {
    if (rows.isEmpty) return ""
    val limited = if (resultsLimit > 0) rows.take(resultsLimit) else rows
    limited.map { case (path, isLeaf) =>
      if (isLeaf) s"""{path="$path",leaf=1}""" else s"""{path="$path"}"""
    }.mkString("[", ",", "]\r\n")
  }

  /** Autocomplete response: a plain sorted JSON string array
    * (`autocomplete.go:489-499`).
    */
  def autocomplete(values: Seq[String]): String =
    values.map(q).mkString("[", ",", "]")
}
