package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The native vector kernels must be bit-identical to the HOF fold
  * they replaced (same index-order double accumulation) — across
  * float/double element types and under codegen.
  */
class VecMathSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def foldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("vec_dot/vec_l2sq are bit-identical to the zip_with+aggregate fold") {
    import spark.implicits._
    // pseudo-random but deterministic float vectors, including
    // negatives and magnitudes that make accumulation order matter
    val df = spark.range(200).select(col("id"),
      transform(sequence(lit(1), lit(64)),
        i => ((pmod(col("id") * 37 + i.cast("long") * 101, lit(1997)) - 998)
          / lit(97.0)).cast("float")).as("a"),
      transform(sequence(lit(1), lit(64)),
        i => ((pmod(col("id") * 53 + i.cast("long") * 29, lit(1997)) - 998)
          / lit(89.0)).cast("float")).as("b"))

    val rows = df.select(
      VecMath.dot(col("a"), col("b")).as("nd"),
      foldDot(col("a"), col("b")).as("fd"),
      VecMath.l2sq(col("a"), col("b")).as("nl"),
      aggregate(zip_with(col("a"), col("b"), (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v).as("fl"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "dot diverged")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "l2sq diverged")
    }
  }

  test("mixed float/double element types and null arrays") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0, 5.0, 6.0)))
      .toDF("f", "d")
    val r = df.select(
      VecMath.dot(col("f"), col("d")).as("dot"),
      VecMath.l2sq(col("f"), col("d")).as("l2"),
      VecMath.dot(lit(null).cast("array<float>"), col("f")).as("nul"))
      .collect().head
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 27.0)
    assert(r.isNullAt(2))
  }

  test("sorted_set_jaccard == intersect/union division on arbitrary word sets") {
    import org.apache.spark.sql.GraftExpressionBridge
    def native(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      GraftExpressionBridge.column(SortedSetJaccard(
        GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
    // deterministic word sets of varying overlap, pre-sorted+distinct
    val df = spark.range(200).select(
      array_sort(array_distinct(transform(sequence(lit(1), pmod(col("id"), lit(7)) + 1),
        i => concat(lit("w"), pmod(col("id") * i, lit(11)))))).as("a"),
      array_sort(array_distinct(transform(sequence(lit(1), pmod(col("id"), lit(5)) + 2),
        i => concat(lit("w"), pmod(col("id") + i * 3, lit(11)))))).as("b"))
    val rows = df.select(
      native(col("a"), col("b")).as("n"),
      (size(array_intersect(col("a"), col("b"))) /
        size(array_union(col("a"), col("b"))).cast("double")).as("h"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"jaccard diverged: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("the kernel stays inside whole-stage codegen") {
    // range input (a literal Seq constant-folds to LocalTableScan);
    // arrays built with array(), not transform — HOF lambdas are
    // CodegenFallback and would drag the whole Project out of codegen
    val df = spark.range(10).select(
      array(col("id").cast("float"), (col("id") + 1).cast("float")).as("a"),
      array((col("id") * 2).cast("float"), (col("id") + 3).cast("float")).as("b"))
    val out = df.select(VecMath.dot(col("a"), col("b")).as("d"))
    // the `*(n)` prefix marks whole-stage-codegen stages in toString
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("Project") && l.contains("*(")),
      s"kernel fell out of codegen:\n$plan")
  }
}
