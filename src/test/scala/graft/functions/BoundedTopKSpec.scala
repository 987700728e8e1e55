package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The bounded-state top-k aggregate vs the rank window it replaces —
  * row-identical output (including tie and NaN conventions), with NO
  * window and NO unbounded collect_list buffer anywhere in the plan.
  */
class BoundedTopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def windowRef(df: org.apache.spark.sql.DataFrame, k: Int, asc: Boolean) = {
    val ord = if (asc) Seq(col("v").asc, col("uid").asc)
    else Seq(col("v").desc, col("uid").asc)
    val w = Window.partitionBy("grp").orderBy(ord: _*)
    df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("grp"), col("rank"), col("uid"), col("v"))
  }

  test("desc: matches the window reference with deliberate value ties") {
    val df = spark.range(2000).select(
      pmod(col("id"), lit(7)).as("grp"),
      col("id").as("uid"),
      pmod(col("id") * 37, lit(11)).cast("double").as("v"))
    val got = BoundedTopK.topK(df, Seq("grp"), struct(col("v"), col("uid")), 4)
      .select(col("grp"), col("rank"), col("__item.uid").as("uid"),
        col("__item.v").as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = windowRef(df, 4, asc = false)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == want)
  }

  test("asc: matches the window reference; k past group size keeps all") {
    val df = spark.range(300).select(
      pmod(col("id"), lit(40)).as("grp"), // groups smaller than k
      col("id").as("uid"),
      pmod(col("id") * 13, lit(5)).cast("double").as("v"))
    val got = BoundedTopK.topK(df, Seq("grp"),
        struct(col("v"), col("uid")), 20, asc = true)
      .select(col("grp"), col("rank"), col("__item.uid").as("uid"),
        col("__item.v").as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = windowRef(df, 20, asc = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == want)
  }

  test("NaN sorts like the window (desc: above every real value)") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 1.0), (1L, 11L, Double.NaN), (1L, 12L, 2.0), (1L, 13L, Double.NaN))
      .toDF("grp", "uid", "v")
    val got = BoundedTopK.topK(df, Seq("grp"), struct(col("v"), col("uid")), 3)
      .select(col("rank"), col("__item.uid").as("uid"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val want = windowRef(df, 3, asc = false)
      .select(col("rank"), col("uid"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got == Set((1, 11L), (2, 13L), (3, 12L)))
  }

  test("payload fields ride through unordered and unchanged") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 3.0, "p1", 10L), ("a", 2L, 9.0, "p2", 20L),
      ("a", 3L, 5.0, "p3", 30L), ("b", 4L, 1.0, "p4", 40L))
      .toDF("grp", "uid", "v", "pay_s", "pay_l")
    val got = BoundedTopK.topK(df, Seq("grp"),
        struct(col("v"), col("uid"), col("pay_s"), col("pay_l")), 2)
      .select(col("grp"), col("rank"), col("__item.uid").as("uid"),
        col("__item.pay_s").as("pay_s"), col("__item.pay_l").as("pay_l"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      ("a", 1, 2L, "p2", 20L), ("a", 2, 3L, "p3", 30L), ("b", 1, 4L, "p4", 40L)))
  }

  test("90%-hot group: no window, no unbounded buffer — plan is one agg pair") {
    val n = 20000
    val df = spark.range(n).select(
      when(col("id") < n * 9 / 10, lit("hot")).otherwise(lit("cold")).as("grp"),
      col("id").as("uid"), (col("id") * 31 % 997).cast("double").as("v"))
    val out = BoundedTopK.topK(df, Seq("grp"), struct(col("v"), col("uid")), 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "window over the group key under skew")
    assert(plan.contains("ObjectHashAggregate"), "expected object hash aggregate")
    assert(!plan.contains("collect_list"), "unbounded per-bucket buffer")

    val rows = out.select(col("grp"), col("__item.uid").as("uid")).collect()
    assert(rows.length == 10)
    val hotTop = (0L until n * 9 / 10).map(i => (-(i * 31 % 997).toDouble, i))
      .sorted.take(5).map(_._2).toSet
    assert(rows.filter(_.getString(0) == "hot").map(_.getLong(1)).toSet == hotTop)
  }

  test("serialize/merge round-trip under forced partial aggregation") {
    // many input partitions force partial buffers to serialize across
    // the exchange and merge on the reduce side
    val df = spark.range(0, 5000, 1, 16).select(
      lit("g").as("grp"), col("id").as("uid"),
      pmod(col("id") * 17, lit(101)).cast("double").as("v"))
    val got = BoundedTopK.topK(df, Seq("grp"), struct(col("v"), col("uid")), 7)
      .select(col("rank"), col("__item.uid").as("uid"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val want = windowRef(df, 7, asc = false)
      .select(col("rank"), col("uid"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == want)
  }
}
