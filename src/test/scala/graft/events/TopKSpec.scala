package graft.events

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The salted two-stage grouped top-k vs the textbook window — same
  * answer, no `Window.partitionBy(group)` in the plan (a 90%-hot
  * group must never serialize into one task).
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("matches the window reference, ties broken by id asc") {
    import spark.implicits._
    // values collide on purpose: (v % 7) gives ties that must resolve
    // by id ascending in both implementations
    val df = spark.range(500).select(
      concat(lit("g"), pmod(col("id"), lit(5))).as("grp"),
      col("id").as("uid"),
      pmod(col("id") * 37, lit(7)).cast("double").as("v"))

    val got = TopK.topKBy(df, Seq("grp"), col("uid"), col("v"), k = 3,
        idName = "uid", valueName = "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val w = Window.partitionBy("grp").orderBy(col("v").desc, col("uid").asc)
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select(col("grp"), col("rank"), col("uid"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

    assert(got == want)
  }

  test("k past the group size ranks every row; singleton groups survive") {
    import spark.implicits._
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 9.0), ("b", 3L, 1.0))
      .toDF("grp", "uid", "v")
    val got = TopK.topKBy(df, Seq("grp"), col("uid"), col("v"), k = 10,
        idName = "uid", valueName = "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(("a", 1L, 2L, 9.0), ("a", 2L, 1L, 5.0), ("b", 1L, 3L, 1.0)))
  }

  test("90%-hot group: no window in the plan, hash aggregates only") {
    import spark.implicits._
    val n = 20000
    val df = spark.range(n).select(
      when(col("id") < n * 9 / 10, lit("hot")).otherwise(lit("cold")).as("grp"),
      col("id").as("uid"), (col("id") * 31 % 997).cast("double").as("v"))

    val out = TopK.topKBy(df, Seq("grp"), col("uid"), col("v"), k = 5,
      idName = "uid", valueName = "v")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "window over the group key under skew")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"),
      "expected (object) hash aggregates")

    val rows = out.collect()
    assert(rows.length == 10)
    // hot group's true top-5: ids maximizing (id*31 % 997) — cross-check
    // against the driver-side computation
    val hotTop = (0L until n * 9 / 10).map(i => (-(i * 31 % 997).toDouble, i))
      .sorted.take(5).map(_._2).toSet
    val gotHot = rows.filter(_.getString(0) == "hot").map(_.getLong(2)).toSet
    assert(gotHot == hotTop)
  }
}
