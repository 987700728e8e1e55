package graft.events

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** ntileExact must reproduce SQL `ntile` exactly (including the
  * first-`total mod n`-buckets-get-one-extra-row rule) without ever
  * putting the relation through a partitionless window.
  */
class RfmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def sqlNtile(vals: Seq[(Long, Double)], n: Int): Map[Long, Long] = {
    import spark.implicits._
    vals.toDF("id", "v").createOrReplaceTempView("nt_in")
    spark.sql(s"SELECT id, CAST(ntile($n) OVER (ORDER BY v, id) AS BIGINT) AS b FROM nt_in")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def exactNtile(vals: Seq[(Long, Double)], n: Int, buckets: Int): Map[Long, Long] = {
    import spark.implicits._
    Rfm.ntileExact(vals.toDF("id", "v"), n, Seq(col("v"), col("id")), buckets = buckets)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bucket")).toMap
  }

  test("matches SQL ntile for n not dividing total, across range-partition counts") {
    val vals = (1L to 103L).map(i => i -> ((i * 37) % 101).toDouble)
    for (n <- Seq(2, 5, 7); buckets <- Seq(1, 3, 16)) {
      assert(exactNtile(vals, n, buckets) == sqlNtile(vals, n),
        s"n=$n buckets=$buckets")
    }
  }

  test("value ties are broken by the id column, matching SQL") {
    val vals = Seq.tabulate(20)(i => (i.toLong, (i % 3).toDouble))
    assert(exactNtile(vals, 4, 5) == sqlNtile(vals, 4))
  }

  test("total smaller than n: each row its own bucket, no divide-by-zero") {
    val vals = Seq((10L, 1.0), (20L, 2.0), (30L, 3.0))
    assert(exactNtile(vals, 5, 2) == sqlNtile(vals, 5))
  }

  test("rank column is an exact 1-based global row number") {
    import spark.implicits._
    val vals = Seq((5L, 9.0), (6L, 1.0), (7L, 4.0), (8L, 4.0))
    val out = Rfm.ntileExact(vals.toDF("id", "v"), 2, Seq(col("v"), col("id")), buckets = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    assert(out == Map(6L -> 1L, 7L -> 2L, 8L -> 3L, 5L -> 4L))
  }

  test("rfm scores each dimension 1..n ascending at the user grain") {
    import spark.implicits._
    // u1: late + frequent + big spender; u2: early + rare + small;
    // u3: middle on every axis.
    val ev = Seq(
      (1L, 100L, 10.0), (1L, 900L, 10.0), (1L, 950L, 10.0),
      (2L, 50L, 1.0),
      (3L, 500L, 3.0), (3L, 600L, 3.0)).toDF("user_id", "t", "value")
    val out = Rfm.rfm(ev, col("user_id"), col("t"), col("value"), n = 3)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("recency"), r.getAs[Long]("frequency"),
          r.getAs[Double]("monetary"),
          r.getAs[Long]("r"), r.getAs[Long]("f"), r.getAs[Long]("m"))))
      .toMap
    assert(out(1L) == ((950L, 3L, 30.0, 3L, 3L, 3L)))
    assert(out(2L) == ((50L, 1L, 1.0, 1L, 1L, 1L)))
    assert(out(3L) == ((600L, 2L, 6.0, 2L, 2L, 2L)))
  }
}
