package graft.prom

import java.time.ZoneId

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.compiler.Tagged.Op
import graft.time.DateWindow

/** Prometheus seams (labels, matchers) and date-window formatting. */
class PromSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("labels: tagged path → sorted labels with __name__") {
    import spark.implicits._
    val rows = Prom.labelRows(Seq("cpu?host=web1&env=prod", "plain.metric").toDF("path"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.filter(_._1 == "cpu?host=web1&env=prod").toList ==
      List( // sorted by label name
        ("cpu?host=web1&env=prod", "__name__", "cpu"),
        ("cpu?host=web1&env=prod", "env", "prod"),
        ("cpu?host=web1&env=prod", "host", "web1")))
    assert(rows.filter(_._1 == "plain.metric").toList ==
      List(("plain.metric", "__name__", "plain.metric")))
  }

  test("plainFromTagged detect: reference vectors (plain_from_tagged.go:23-66)") {
    import PlainFromTagged._
    // the canonical shape
    assert(detect(Seq(("__name__", "=", "graphite"),
      ("target", "=", "telegraf.*.cpu.avg"))) ==
      Some(Route("telegraf.*.cpu.avg", "graphite", Map.empty)))
    // both trigger matchers required, Eq only, non-empty target
    assert(detect(Seq(("__name__", "=", "graphite"))).isEmpty)
    assert(detect(Seq(("target", "=", "a.b"))).isEmpty)
    assert(detect(Seq(("__name__", "=~", "graphite"), ("target", "=", "a.b"))).isEmpty)
    assert(detect(Seq(("__name__", "=", "graphite"), ("target", "=", ""))).isEmpty)
    assert(detect(Seq(("__name__", "=", "other"), ("target", "=", "a.b"))).isEmpty)
    // last assignment wins (the reference's loop overwrites)
    assert(detect(Seq(("__name__", "=", "graphite"),
      ("target", "=", "a.*"), ("target", "=", "b.*"))).get.target == "b.*")
    // rename + node labels; non-numeric node suffix skipped (`:52-55`)
    assert(detect(Seq(("__name__", "=", "graphite"), ("target", "=", "a.*"),
      ("rename", "=", "cpu"), ("node1", "=", "host"),
      ("nodeX", "=", "bad"), ("node2", "!=", "notEq"))) ==
      Some(Route("a.*", "cpu", Map(1 -> "host"))))
  }

  test("plainFromTagged abs: synthetic tagged form (plain_from_tagged.go:85-124)") {
    import spark.implicits._
    def absOf(route: PlainFromTagged.Route, paths: String*): Seq[String] =
      paths.toDF("path")
        .select(PlainFromTagged.abs(org.apache.spark.sql.functions.col("path"), route))
        .collect().map(_.getString(0)).toSeq
    // node label + metric, sorted by label name; default name
    assert(absOf(PlainFromTagged.Route("t", "graphite", Map(1 -> "host")),
      "telegraf.web1.cpu.avg") ==
      Seq("graphite?host=web1&metric=telegraf.web1.cpu.avg"))
    // rename; node index past the path depth contributes nothing
    assert(absOf(PlainFromTagged.Route("t", "cpu", Map(0 -> "app", 9 -> "zzz")),
      "telegraf.web1") ==
      Seq("cpu?app=telegraf&metric=telegraf.web1"))
    // go url.QueryEscape byte-parity: space → '+', '*' → %2A, '~' bare
    assert(absOf(PlainFromTagged.Route("t", "graphite", Map.empty),
      "a b.c*d~e") ==
      Seq("graphite?metric=a+b.c%2Ad~e"))
  }

  test("matchersToTerms: op mapping + base sort") {
    val Right(terms) = Prom.matchersToTerms(Seq(
      ("job", "!=", "x"),
      ("__name__", "=", "up"),
      ("instance", "=~", "web.*")))
    assert(terms.map(_.op) == List(Op.Eq, Op.Match, Op.Ne)) // op-rank order
    assert(terms.head.key == "__name__")
    assert(Prom.matchersToTerms(Seq(("a", "??", "b"))).isLeft)
  }

  test("findPathsCached: structural matcher key — no string-serialization aliasing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val paths = Seq("m?a=b)|(c,=,d", "m?a=b&c=d").toDF("path")
      .withColumn("date", lit("1970-01-01").cast("date"))
      .withColumn("version", lit(0L))
    val tags = graft.engine.GraphiteTables.expandTagRows(paths)
    val m1 = Seq(("a", "=", "b)|(c,=,d"))
    val m2 = Seq(("a", "=", "b"), ("c", "=", "d"))
    // the two matcher sets serialize to the SAME joined string — the
    // memo must still key them separately (structural list equality)
    assert(m1.mkString("|") == m2.mkString("|"))
    val r1 = Prom.findPathsCached(tags, m1).collect().map(_.getString(0)).toSet
    val r2 = Prom.findPathsCached(tags, m2).collect().map(_.getString(0)).toSet
    assert(r1 == Set("m?a=b)|(c,=,d"))
    assert(r2 == Set("m?a=b&c=d"))
  }

  test("date window modes") {
    val tz = ZoneId.of("America/New_York") // UTC-5 in January
    val ts = 1704070800L // 2024-01-01 01:00 UTC = 2023-12-31 20:00 EST
    assert(DateWindow.utc(ts) == "2024-01-01")
    assert(DateWindow.default(ts, tz) == "2023-12-31")
    assert(DateWindow.minBoth(ts, tz) == "2023-12-31")
    assert(DateWindow.maxBoth(ts, tz) == "2024-01-01")
    assert(DateWindow.window(ts, ts, "both", tz) == ("2023-12-31", "2024-01-01"))
    intercept[IllegalArgumentException](DateWindow.window(0, 0, "bogus"))
  }

  test("parseSelector: metric, matchers, escapes, errors") {
    import Prom.parseSelector
    assert(parseSelector("up") == Right(Seq(("__name__", "=", "up"))))
    assert(parseSelector("""up{job="api"}""") ==
      Right(Seq(("__name__", "=", "up"), ("job", "=", "api"))))
    assert(parseSelector("""{a="1", b!="2", c=~"x.*", d!~"y"}""") ==
      Right(Seq(("a", "=", "1"), ("b", "!=", "2"), ("c", "=~", "x.*"), ("d", "!~", "y"))))
    assert(parseSelector("""{k="quo\"te"}""") == Right(Seq(("k", "=", "quo\"te"))))
    assert(parseSelector("{unclosed").isLeft)
    assert(parseSelector("""{k="unterminated}""").isLeft)
    assert(parseSelector("""{="novalue"}""").isLeft)
    assert(parseSelector("{}").isLeft)
    assert(parseSelector("""{k="a" j="b"}""").isLeft) // missing comma
  }
}
