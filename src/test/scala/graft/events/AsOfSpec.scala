package graft.events

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** AS-OF join semantics (backward-inclusive, per key) and plan shape
  * (one union + key-bounded window — never an inequality theta join).
  */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("backward-inclusive match, nulls before the first right row, per-key isolation") {
    import spark.implicits._
    val left = Seq(
      (1L, 5L), (1L, 10L), (1L, 15L), (1L, 30L), // user 1 events
      (2L, 100L)                                 // user 2 never has a dim row
    ).toDF("k", "t")
    val right = Seq(
      (1L, 10L, 1.0), (1L, 20L, 2.0)
    ).toDF("k", "rt", "v")

    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap

    assert(out((1L, 5L)) == ((None, None)))            // before first dim row
    assert(out((1L, 10L)) == ((Some(10L), Some(1.0)))) // inclusive at equal t
    assert(out((1L, 15L)) == ((Some(10L), Some(1.0))))
    assert(out((1L, 30L)) == ((Some(20L), Some(2.0)))) // latest preceding wins
    assert(out((2L, 100L)) == ((None, None)))          // other key unaffected
  }

  test("plan: no nested-loop/cartesian; the ride-forward window is keyed") {
    import spark.implicits._
    val left = spark.range(1000).select(pmod(col("id"), lit(10)).as("k"),
      col("id").as("t"))
    val right = spark.range(100).select(pmod(col("id"), lit(10)).as("k"),
      (col("id") * 7).as("rt"), col("id").cast("double").as("v"))
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "as-of must not plan as an inequality theta join")
    assert(plan.contains("Window"), "expected the ride-forward window")
    assert(out.count() == 1000)
  }
}
