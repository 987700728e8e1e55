package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The approximate companions to the exact operators: sketches are
  * single-pass and MERGEABLE (map-side partials, no second shuffle),
  * the right default at 100 TB when oracle-grade exactness isn't
  * required. These tests pin their error against the exact answers
  * the oracle-checked operators produce — the documented contract for
  * choosing `approx_*` over the two-phase exact rank.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("approx_percentile lands within 1% of the exact two-phase quantile") {
    // skewed but deterministic values
    val df = spark.range(100000).select(
      (col("id") * col("id") % 99991).cast("double").as("v"))
    val approx = df.select(
      percentile_approx(col("v"), lit(0.5), lit(10000))).collect()(0).getDouble(0)
    val exact = Quantiles.exactQuantiles(df, col("v"), Seq(0.5))
      .collect()(0).getDouble(1)
    assert(math.abs(approx - exact) <= math.max(1.0, 0.01 * exact),
      s"approx p50 $approx vs exact $exact")
  }

  test("approx_count_distinct lands within 5% of the exact distinct") {
    val df = spark.range(200000).select((col("id") % 37777).as("k"))
    val approx = df.select(approx_count_distinct(col("k"), 0.02))
      .collect()(0).getLong(0)
    val exact = 37777L
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx $approx vs exact $exact")
  }

  test("sketch aggregation plans keep map-side partial aggregation") {
    val df = spark.range(10000).select((col("id") % 97).as("g"),
      col("id").cast("double").as("v"))
    val plan = df.groupBy("g")
      .agg(approx_count_distinct(col("v")).as("nd"),
        percentile_approx(col("v"), lit(0.9), lit(100)).as("p90"))
      .queryExecution.executedPlan.toString
    // both a partial and a final aggregate stage must appear
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate") ||
      plan.contains("HashAggregate"))
    assert("partial_".r.findFirstIn(plan).isDefined,
      s"no partial aggregation in:\n$plan")
  }
}
