package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import graft.compiler.Tagged
import graft.compiler.Tagged.{Costs, Op, Term}
import graft.model.TimeFrame

/** Plan-time gates: blacklist, prefix wrapper, table routing, guards
  * (`finder/blacklist.go`, `finder/prefix.go`,
  * `render/data/targets.go:75-132`) and cost-based term ordering
  * (`finder/tagged.go:284-300,639-672`).
  */
class RoutingSpec extends AnyFunSuite {

  test("blacklist matches anywhere in the query") {
    val bl = Seq("^secret\\.".r, "internal".r)
    assert(Routing.isBlacklisted("secret.metric", bl))
    assert(Routing.isBlacklisted("app.internal.counter", bl))
    assert(!Routing.isBlacklisted("app.public.counter", bl))
    assert(!Routing.isBlacklisted("app.public", Nil))
  }

  test("prefix wrapper: not matched / partial / matched") {
    assert(Routing.matchPrefix("ext.rem", "other") == Routing.PrefixNotMatched)
    // query is a glob over prefix segments
    assert(Routing.matchPrefix("ext.rem", "e*") == Routing.PrefixPartial("ext."))
    assert(Routing.matchPrefix("ext.rem", "ext.rem") == Routing.PrefixPartial("ext.rem."))
    assert(Routing.matchPrefix("ext.rem", "ext.rem.carbon.*") ==
      Routing.PrefixMatched("carbon.*"))
    assert(Routing.matchPrefix("", "a.b") == Routing.PrefixMatched("a.b"))
    assert(Routing.absPath("ext.rem", "carbon.agents") == "ext.rem.carbon.agents")
  }

  test("data-table routing: first rule passing all bounds wins") {
    val rules = Seq(
      Routing.DataTableRule("short", maxInterval = 3600),
      Routing.DataTableRule("recent", maxAge = 86400),
      Routing.DataTableRule("history"))
    val now = 1000000L
    // 1h window, recent → first rule
    assert(Routing.selectDataTable(
      rules, Seq("a.b"), TimeFrame(now - 3000, now), now).map(_.table) == Some("short"))
    // 2-day-wide window starting recently → second rule
    assert(Routing.selectDataTable(
      rules, Seq("a.b"), TimeFrame(now - 7200, now), now).map(_.table) == Some("recent"))
    // old from → history
    assert(Routing.selectDataTable(
      rules, Seq("a.b"), TimeFrame(now - 200000, now), now).map(_.table) == Some("history"))
    assert(Routing.selectDataTable(Nil, Seq("a.b"), TimeFrame(0, 1), now).isEmpty)
  }

  test("data-table routing: target regexes") {
    val rules = Seq(
      Routing.DataTableRule("all-match", targetMatchAll = Some("^app\\.".r)),
      Routing.DataTableRule("any-match", targetMatchAny = Some("^sys\\.".r)),
      Routing.DataTableRule("fallback"))
    val now = 0L
    assert(Routing.selectDataTable(
      rules, Seq("app.x", "app.y"), TimeFrame(0, 1), now).map(_.table) == Some("all-match"))
    assert(Routing.selectDataTable(
      rules, Seq("app.x", "sys.y"), TimeFrame(0, 1), now).map(_.table) == Some("any-match"))
    assert(Routing.selectDataTable(
      rules, Seq("other.x"), TimeFrame(0, 1), now).map(_.table) == Some("fallback"))
  }

  test("review-fix regressions: grammar, rollup parsing, escape round-trip") {
    import graft.compiler.{Tagged => T}
    import graft.rollup.Rules
    import graft.time.TimeGrammar
    import java.time.{Duration, Instant, ZoneId}
    val utc = ZoneId.of("UTC")
    val now = Instant.ofEpochSecond(1704067200L)
    // out-of-range HH:MM normalizes forward (Go time.Date behavior)
    assert(TimeGrammar.parse("25:00_20240101", utc, now) == 1704067200L + 25 * 3600)
    // overflowing digit runs are unparseable → 0, not an exception
    assert(TimeGrammar.parse("-99999999999999999999s", utc, now) == 0L)
    // malformed brace glob in a tagged term is a request error
    intercept[IllegalArgumentException](
      T.parseSeriesByTag("seriesByTag('k={a')").toOption.get.head match {
        case t => T.wherePredicate(
          org.apache.spark.sql.functions.col("tag1"),
          org.apache.spark.sql.functions.col("tags"), List(t),
          graft.model.FeatureFlags())
      })
    // unescape: malformed escapes pass through verbatim, 3 chars
    // consumed (so the '%' of a following valid escape is swallowed)
    assert(T.unescape("%x%41") == "%x%41")
    assert(T.unescape("%%41") == "%%41")
    assert(T.unescape("a%4") == "a%4")
    // encode/decode round trip with structural chars in values
    val display = "m;a=1&2;b=x;y"
    assert(T.decodePath(T.encodePath(display)).split(";", -1).sorted.toSeq ==
      display.split(";", -1).sorted.toSeq)
    // decodePath keeps trailing empty components (Go strings.Split)
    assert(T.decodePath("m?a=b&") == "m;;a=b")
    // xml retention with omitted age defaults to 0
    val rules = Rules.fromXml(
      "<graphite_rollup><default><function>avg</function>" +
        "<retention><precision>60</precision></retention></default></graphite_rollup>")
    assert(rules.lookup("x", 0)._1 == 60L)
    // compact grammar: malformed retention is a clean error
    intercept[IllegalArgumentException](Rules.parseCompact("\\.max$;max;60"))
  }

  test("useReverse counts flank dots, not char positions") {
    // reference finder/index.go:111-123 vectors
    assert(!Finder.useReverse("a.b.c"))                 // no wildcard
    assert(Finder.useReverse("*.cpu.load"))             // 0 < 2 dots
    assert(!Finder.useReverse("host.cpu.*"))            // 2 > 0
    assert(!Finder.useReverse("a.*.somelongsegment"))   // 1 == 1 → direct
    assert(!Finder.useReverse("some.*.metric"))         // 1 == 1 → direct
  }

  test("max-metrics guards") {
    assert(Routing.capFindAnswer(Seq(1, 2, 3), 2) == Seq(1, 2))
    assert(Routing.capFindAnswer(Seq(1, 2, 3), 0) == Seq(1, 2, 3))
    assert(Routing.checkMetricsPerTarget("t", 10, 5).isLeft)
    assert(Routing.checkMetricsPerTarget("t", 5, 5).isRight)
    assert(Routing.checkMetricsPerTarget("t", 999, 0).isRight)
  }

  test("setCosts: per-value cost hits Eq and Match; per-key only exact Eq") {
    val terms = List(
      Term("env", Op.Eq, "prod"),
      Term("host", Op.Eq, "web*", hasWildcard = true),
      Term("dc", Op.Match, "us-.*"))
    val costs = Map(
      "env" -> Costs(cost = Some(5), valuesCost = Map("staging" -> 1)),
      "host" -> Costs(cost = Some(2)),
      "dc" -> Costs(valuesCost = Map("us-.*" -> 3)))
    val out = Tagged.setCosts(terms, costs)
    assert(out(0).cost == 5 && out(0).nonDefaultCost) // per-key, exact eq
    assert(out(1).cost == 0 && !out(1).nonDefaultCost) // wildcard eq: key cost ignored
    assert(out(2).cost == 3 && out(2).nonDefaultCost) // per-value on match
  }

  test("sortTerms is total and honors costs for 33+ terms (TimSort contract)") {
    // would throw IllegalArgumentException with a non-strict sortWith
    val terms = (1 to 40).toList.map { i =>
      Term(s"k$i", if (i % 2 == 0) Op.Eq else Op.Match, s"v$i",
        hasWildcard = i % 4 == 0, cost = 40 - i, nonDefaultCost = true)
    }
    val sorted = Tagged.sortTerms(terms)
    assert(sorted.map(_.cost) == sorted.map(_.cost).sorted)
    // mixed default costs: op rank dominates
    val mixed = List(
      Term("a", Op.Ne, "x"),
      Term("b", Op.Eq, "y"),
      Term("__name__", Op.Eq, "m"),
      Term("c", Op.Eq, "z*", hasWildcard = true))
    val s2 = Tagged.sortTerms(mixed)
    assert(s2.map(_.key) == List("__name__", "b", "c", "a"))
  }

  // ----------------------------------------------------------------
  // U3 reverse config overrides (`finder/index_test.go:14-100`,
  // `config/config_test.go:393-395`)
  // ----------------------------------------------------------------

  test("useReverse: forced global mode wins (Test_useReverseWithSetConfig vectors)") {
    import Routing.{ReverseMode, ReversePolicy}
    val vectors = Seq(
      ("a.b.c.d.e", ReverseMode.Reversed, true),
      ("a.b.c.d.e", ReverseMode.Auto, false),
      ("a.b.c.d.e", ReverseMode.Direct, false),
      ("a.b.c.d.e*", ReverseMode.Direct, false),
      ("a.b.c.d*.e", ReverseMode.Direct, false),
      ("a.b.c.d*.e", ReverseMode.Reversed, true),
      ("a*.b.c.d*.e", ReverseMode.Reversed, true),
      ("a.b*.c.d*.e", ReverseMode.Reversed, true),
      ("a.*.c.*.e.*.j", ReverseMode.Reversed, true),
      ("a.*.c.*.e.*.j", ReverseMode.Direct, false),
      ("a.b*.c.*d.e", ReverseMode.Reversed, true))
    vectors.foreach { case (q, mode, want) =>
      assert(Finder.useReverse(q, ReversePolicy(mode)) == want, s"$q $mode")
    }
  }

  test("checkReverses: first matching rule wins (Test_checkReverses vectors)") {
    import Routing.{ReverseMode, ReversePolicy, ReverseRule}
    val rules = Seq(
      ReverseRule.compile(suffix = ".sum", reverse = "direct"),
      ReverseRule.compile(prefix = "test.", suffix = ".alloc", reverse = "direct"),
      ReverseRule.compile(prefix = "test2.", reverse = "reversed"),
      ReverseRule.compile(regexStr = """^a\..*\.max$""", reverse = "reversed"))
      .map(_.toOption.get)
    val policy = ReversePolicy(ReverseMode.Auto, rules)
    val vectors = Seq(
      ("a.b.c.d*.sum", false),
      ("a*.b.c.d.sum", false),
      ("test.b.c*.d*.alloc", false),
      ("test.b.c*.d.alloc", false),
      ("test2.b.c*.d*.e", true),
      ("test2.b.c*.d.e", true),
      ("a.b.c.d*.max", true),
      ("a.b.c*.d.max", true))
    vectors.foreach { case (q, want) =>
      assert(Finder.useReverse(q, policy) == want, q)
    }
    // unmatched queries fall back to the dot-count heuristic
    assert(Finder.useReverse("z.b*.c.d.e", policy) == Finder.useReverse("z.b*.c.d.e"))
  }

  test("reverse rule validation: empty rule and bad mode are config errors") {
    import Routing.ReverseRule
    assert(ReverseRule.compile().isLeft)
    assert(ReverseRule.compile(prefix = "a.", reverse = "sideways").isLeft)
    assert(ReverseRule.compile(regexStr = "[unclosed", reverse = "direct").isLeft)
    assert(ReverseRule.compile(suffix = ".sum", reverse = "direct").isRight)
  }

  test("find honors a per-rule reverse override end to end") {
    import Routing.{ReverseMode, ReversePolicy, ReverseRule}
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rev").toFile.getAbsolutePath
    graft.streaming.Ingest.processBatch(
      graft.streaming.Ingest.parseLines(
        Seq("test2.metric.leaf 1.0 1000").toDF("value")), s"$dir/t")
    val index = spark.read.parquet(s"$dir/t/index")
    val policy = ReversePolicy(ReverseMode.Auto,
      Seq(ReverseRule.compile(prefix = "test2.", reverse = "reversed").toOption.get))
    // forced-reversed query answers identically to the direct plan
    val got = Finder.find(index, "test2.metric.*", reversePolicy = policy)
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSet
    assert(got == Set(("test2.metric.leaf", true)))
  }
}
