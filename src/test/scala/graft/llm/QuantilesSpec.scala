package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** exactQuantiles must reproduce percentile_cont interpolation across
  * odd/even counts, integer positions, and duplicate values — without
  * a global sort.
  */
class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def sqlQuantile(vals: Seq[Double], q: Double): Double = {
    import spark.implicits._
    vals.toDF("v").createOrReplaceTempView("qt_in")
    val got = spark.sql(
      s"SELECT round(percentile_cont($q) WITHIN GROUP (ORDER BY v), 4) FROM qt_in")
      .collect().head.getDouble(0)
    got
  }

  private def exact(vals: Seq[Double], qs: Seq[Double], buckets: Int = 4): Map[Double, Double] = {
    import spark.implicits._
    Quantiles.exactQuantiles(vals.toDF("v"), col("v"), qs, buckets = buckets)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
  }

  test("matches percentile_cont on odd, even, duplicated, and skewed data") {
    val cases = Seq(
      (1 to 101).map(_.toDouble),                      // odd n, exact positions
      (1 to 100).map(_.toDouble),                      // even n, interpolated
      Seq.fill(50)(7.0) ++ (1 to 50).map(_.toDouble),  // heavy duplicates
      (1 to 97).map(i => math.pow(1.1, i)))            // skewed tail
    val qs = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    for (vals <- cases; buckets <- Seq(1, 4, 16)) {
      val got = exact(vals, qs, buckets)
      for (q <- qs)
        assert(got(q) == sqlQuantile(vals, q),
          s"q=$q buckets=$buckets n=${vals.length}")
    }
  }

  test("single-value relation: every quantile is that value") {
    assert(exact(Seq(42.0), Seq(0.0, 0.5, 1.0)) ==
      Map(0.0 -> 42.0, 0.5 -> 42.0, 1.0 -> 42.0))
  }
}
