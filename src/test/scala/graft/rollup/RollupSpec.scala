package graft.rollup

import org.scalatest.funsuite.AnyFunSuite

/** Lookup vectors mirror /root/reference/helper/rollup/rules_test.go. */
class RollupSpec extends AnyFunSuite {

  private val compactConfig =
    """
    ^hourly;;3600:60,86400:3600
    ^live;;0:1
    total$;sum;
    min$;min;
    max$;max;
    ;avg;
    ;;60:10
    ;;0:42"""

  test("compact lookup matches reference vectors") {
    val r = Rules.parseCompact(compactConfig)
    val table = Seq(
      ("hello.world", 0L, "avg", 42L),
      ("hourly.rps", 0L, "avg", 42L),
      ("hourly.rps_total", 0L, "sum", 42L),
      ("live.rps_total", 0L, "sum", 1L),
      ("hourly.rps_min", 0L, "min", 42L),
      ("hourly.rps_min", 59L, "min", 42L),
      ("hourly.rps_min", 60L, "min", 10L),
      ("hourly.rps_min", 3599L, "min", 10L),
      ("hourly.rps_min", 3600L, "min", 60L),
      ("hourly.rps_min", 86399L, "min", 60L),
      ("hourly.rps_min", 86400L, "min", 3600L),
      ("hourly.rps_min", 86401L, "min", 3600L)
    )
    table.foreach { case (metric, age, fn, prec) =>
      val (p, a) = r.lookup(metric, age)
      assert(a.name == fn, s"function for $metric@$age")
      assert(p == prec, s"precision for $metric@$age")
    }
  }

  test("xml parsing of the reference fixture shape") {
    val xml =
      """<yandex>
        |<graphite_rollup>
        |  <default>
        |    <function>avg</function>
        |    <retention><age>0</age><precision>10</precision></retention>
        |  </default>
        |  <pattern><regexp>\.sum$</regexp><function>sum</function></pattern>
        |  <pattern><regexp>\.sum\?</regexp><function>sum</function></pattern>
        |  <pattern><regexp>\.min$</regexp><function>min</function></pattern>
        |  <pattern><regexp>\.max$</regexp><function>max</function></pattern>
        |</graphite_rollup>
        |</yandex>""".stripMargin
    val r = Rules.fromXml(xml)
    assert(r.lookup("some.metric", 0) == ((10L, AggFunc.Avg)))
    assert(r.lookup("requests.sum", 0) == ((10L, AggFunc.Sum)))
    assert(r.lookup("requests.sum?env=prod", 0) == ((10L, AggFunc.Sum)))
    assert(r.lookup("temp.min", 0) == ((10L, AggFunc.Min)))
    assert(r.lookup("temp.max", 100) == ((10L, AggFunc.Max)))
  }

  test("tag_list regex build") {
    assert(Rules.buildTaggedRegex("fake_name") == "^fake_name\\?")
    assert(Rules.buildTaggedRegex("tag2=val2") == "[\\?&]tag2=val2(&.*)?$")
    assert(Rules.buildTaggedRegex("fake3;tag3=Fake3") ==
      "^fake3\\?(.*&)?tag3=Fake3(&.*)?$")
    // multiple tags sorted
    assert(Rules.buildTaggedRegex("tag5=Fake5;tag3=Fake3") ==
      "[\\?&]tag3=Fake3&(.*&)?tag5=Fake5(&.*)?$")
  }

  test("tag_list rules match tagged paths") {
    val r = Rules(
      List(Pattern(RuleType.TagList, "fake3;tag3=Fake3", Some(AggFunc.Sum),
        List(Retention(0, 1)))),
      defaultPrecision = 60, defaultFunction = Some(AggFunc.Avg))
    assert(r.lookup("fake3?tag3=Fake3", 0) == ((1L, AggFunc.Sum)))
    assert(r.lookup("fake3?tag2=x&tag3=Fake3", 0) == ((1L, AggFunc.Sum)))
    assert(r.lookup("fake4?tag3=Fake3", 0) == ((60L, AggFunc.Avg)))
    // plain metric never hits tagged rules (separated mode)
    assert(r.lookup("fake3.tag3", 0) == ((60L, AggFunc.Avg)))
  }

  test("separated plain vs tagged dispatch") {
    val r = Rules(
      List(
        Pattern(RuleType.Plain, "total$", Some(AggFunc.Sum), Nil),
        Pattern(RuleType.Tagged, "^tagged", Some(AggFunc.Max), Nil)),
      defaultPrecision = 30, defaultFunction = Some(AggFunc.Avg))
    assert(r.lookup("x.total", 0)._2 == AggFunc.Sum)
    assert(r.lookup("tagged?total=1", 0)._2 == AggFunc.Max)
    // tagged metric skips plain rules
    assert(r.lookup("tagged_total?a=1", 0)._2 == AggFunc.Max)
    assert(r.lookup("plain.tagged", 0)._2 == AggFunc.Avg)
  }

  test("aggregation functions") {
    val v = Seq(1.0, 3.0, 2.0)
    assert(AggFunc.Avg(v) == 2.0)
    assert(AggFunc.Sum(v) == 6.0)
    assert(AggFunc.Min(v) == 1.0)
    assert(AggFunc.Max(v) == 3.0)
    assert(AggFunc.Any(v) == 1.0)
    assert(AggFunc.AnyLast(v) == 2.0)
    assert(AggFunc.fromName("average").contains(AggFunc.Avg))
    assert(AggFunc.fromName("last").contains(AggFunc.AnyLast))
    assert(AggFunc.fromName("first").contains(AggFunc.Any))
    assert(AggFunc.fromName("bogus").isEmpty)
  }
}
