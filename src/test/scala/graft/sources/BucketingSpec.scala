package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Bucketed layout must eliminate the Exchange for same-key joins and
  * bucket-key aggregations — the write-time contract that replaces
  * the per-query shuffle at scale.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("co-bucketed join and bucket-key aggregation plan with no shuffle") {
    val n = 10000
    val a = spark.range(n).select(col("id").as("k"), (col("id") * 3).as("va"))
    val b = spark.range(n / 2).select(col("id").as("k"), (col("id") * 7).as("vb"))
    Bucketing.writeBucketed(a, "bk_a", 8, Seq("k"), Seq("k"))
    Bucketing.writeBucketed(b, "bk_b", 8, Seq("k"), Seq("k"))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.table(spark, "bk_a")
        .join(Bucketing.table(spark, "bk_b"), Seq("k"))
      val jplan = joined.queryExecution.executedPlan.toString
      assert(!jplan.contains("Exchange"),
        s"co-bucketed join still shuffles:\n$jplan")
      assert(joined.count() == n / 2)

      val agg = Bucketing.table(spark, "bk_a").groupBy("k")
        .agg(sum("va").as("s"))
      val aplan = agg.queryExecution.executedPlan.toString
      assert(!aplan.contains("Exchange"),
        s"bucket-key aggregation still shuffles:\n$aplan")
      assert(agg.count() == n)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }

  test("a non-bucketed twin of the same join DOES shuffle (the contrast)") {
    val a = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("va"))
    val b = spark.range(500).select(col("id").as("k"), (col("id") * 7).as("vb"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = a.join(b, Seq("k")).queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), "expected the baseline shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
