package graft.events

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Bucketized interval join: exact BETWEEN semantics through an
  * equi-join on (keys, bucket) — never a nested-loop theta join.
  */
class IntervalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("boundary inclusion, bucket-crossing intervals, overlaps fan out") {
    import spark.implicits._
    val points = Seq(
      ("a", 999L), ("a", 1000L), ("a", 5000L), ("a", 9000L), ("a", 9001L),
      ("b", 5000L) // other key: no matching interval
    ).toDF("k", "t")
    // one interval crossing several 3600s buckets, one overlapping it
    val intervals = Seq(
      ("a", 1000L, 9000L, "long"),
      ("a", 4000L, 6000L, "inner")
    ).toDF("k", "s", "e", "name")

    val out = Intervals.intervalJoin(points, intervals, Seq("k"), "t", "s", "e")
      .select("k", "t", "name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set(
      ("a", 1000L, "long"), ("a", 5000L, "long"), ("a", 9000L, "long"),
      ("a", 5000L, "inner")))

    val plan = Intervals.intervalJoin(points, intervals, Seq("k"), "t", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "interval join must stay an equi-join on the bucket key")
  }
}
