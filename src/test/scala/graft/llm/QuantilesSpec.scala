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

  test("grouped quantiles match per-group percentile_cont, hot group included") {
    import spark.implicits._
    // group a: 90% of the rows (the hot group); b: even count; c: one row
    val rows = (1 to 900).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(i => ("b", i * 10.0)) ++ Seq(("c", 5.0))
    val df = rows.toDF("g", "v")
    df.createOrReplaceTempView("qtg_in")
    val qs = Seq(0.25, 0.5, 0.9)
    for (buckets <- Seq(1, 4, 16)) {
      val got = Quantiles.exactQuantilesBy(df, "g", col("v"), qs, buckets = buckets)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
        .toMap
      for (q <- qs) {
        val want = spark.sql(
          s"SELECT g, round(percentile_cont($q) WITHIN GROUP (ORDER BY v), 4) FROM qtg_in GROUP BY g")
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        for (g <- Seq("a", "b", "c"))
          assert(got((g, q)) == want(g), s"g=$g q=$q buckets=$buckets")
      }
    }
  }

  test("grouped rank is exact per group across range splits") {
    import spark.implicits._
    val df = Seq(("x", 30.0), ("x", 10.0), ("y", 5.0), ("x", 20.0), ("y", 1.0))
      .toDF("g", "v")
    val out = graft.events.Rfm.rankExactBy(df, Seq("g"), Seq(col("v")),
        buckets = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getAs[Long]("rank"), r.getAs[Long]("total")))).toMap
    assert(out(("x", 10.0)) == ((1L, 3L)))
    assert(out(("x", 20.0)) == ((2L, 3L)))
    assert(out(("x", 30.0)) == ((3L, 3L)))
    assert(out(("y", 1.0)) == ((1L, 2L)))
    assert(out(("y", 5.0)) == ((2L, 2L)))
  }
}
