package graft.compiler

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.glob.Glob

/** Native codegen'd glob matcher vs the regex translation: the two
  * paths must agree on every (glob, path) pair.
  */
class GlobMatchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val globs = Seq(
    "a.*.c", "a.b?", "a.b*", "*.b.c", "a.[bc]x.*", "{x,y}.z",
    "a.{b,c}.d", "a.{b,{c,d}}.e", "[^a]b.c", "a.*", "srv-[0-9].cpu.*",
    "a.b.c")
  private val paths = Seq(
    "a.b.c", "a.bb.c", "a.b.b.c", "a.bx", "a.b", "x.z", "y.z", "z.z",
    "a.bx.q", "a.cx.q", "a.dx.q", "a.c.d", "a.d.e", "a.c.e", "a.b.e",
    "ab.c", "cb.c", "srv-1.cpu.load", "srv-x.cpu.load", "a.", "a.b.",
    "b.b.c", "a.b.c.d")

  test("native matcher agrees with the regex translation on all pairs") {
    for (g <- globs; optDot <- Seq(false, true)) {
      assert(GlobMatch.expressible(g), g)
      val m = new GlobMatcher(g, optDot)
      val re = ("^" + Glob.globToRegexp(g) + (if (optDot) "[.]?$" else "$")).r
      for (p <- paths) {
        val expected = re.pattern.matcher(p).matches()
        assert(m.matchesString(p) == expected, s"glob=$g optDot=$optDot path=$p")
      }
    }
  }

  test("top-level comma quirk is not expressible (regex fallback)") {
    assert(!GlobMatch.expressible("a,b.c"))
  }

  test("glob_match registered as a SQL function") {
    import spark.implicits._
    graft.GraftFunctions.register(spark)
    paths.toDF("path").createOrReplaceTempView("gm_paths")
    val got = spark.sql(
      "SELECT path FROM gm_paths WHERE glob_match(path, 'a.*.c')")
      .as[String].collect().toSet
    assert(got == Set("a.b.c", "a.bb.c"))
    val withDot = spark.sql(
      "SELECT path FROM gm_paths WHERE glob_match(path, 'a.b', true)")
      .as[String].collect().toSet
    assert(withDot == Set("a.b", "a.b."))
  }

  test("DataFrame predicate: native equals regex path under codegen") {
    import spark.implicits._
    val df = paths.toDF("path").cache()
    for (g <- globs) {
      val native = df.where(GlobCompiler.globNative(col("path"), g, optionalDotAtEnd = true))
        .as[String].collect().toSet
      val regex = df.where(GlobCompiler.glob(col("path"), g, optionalDotAtEnd = true))
        .as[String].collect().toSet
      assert(native == regex, s"glob=$g native=$native regex=$regex")
    }
  }
}
