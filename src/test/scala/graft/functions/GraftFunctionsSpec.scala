package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftFunctions, SparkTestBase}

/** Every custom expression must be callable from SQL once registered
  * (`spark.sql.extensions=graft.GraftExtensions` cluster-wide, or
  * `GraftFunctions.register` on a live session).
  */
class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkTestBase.spark; GraftFunctions.register(s); s }

  test("all six custom expressions answer from SQL") {
    val r = spark.sql("""
      SELECT
        glob_match('a.b.c', 'a.*.c')                        AS g,
        normalize_text('  Héllo   World ')                  AS n,
        vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F))       AS d,
        vec_l2sq(array(0.0F, 0.0F), array(3.0F, 4.0F))      AS l2,
        word_shingles('a b c d', 3)                         AS sh,
        positional_shingles(array('a', 'b', 'a', 'b'), 2)   AS ps,
        zorder(5L, 3L, 8)                                   AS z
      """).collect()(0)
    assert(r.getBoolean(0))
    assert(r.getString(1) == "hello world")
    assert(r.getDouble(2) == 11.0)
    assert(r.getDouble(3) == 25.0)
    assert(r.getSeq[String](4) == Seq("a b c", "b c d"))
    assert(r.getSeq[String](5) == Seq("a b", "b a", "a b"))
    assert(r.getLong(6) == 27L)
  }

  test("arity and literal-argument errors are reported, not miscompiled") {
    intercept[Exception](spark.sql("SELECT word_shingles('a b c')").collect())
    intercept[Exception](
      spark.sql("SELECT word_shingles('a b c', length('xx'))").collect())
  }
}
