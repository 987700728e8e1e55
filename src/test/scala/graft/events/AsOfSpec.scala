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

  test("bucketed variant ≡ plain as-of on dense data; final window keyed per bucket") {
    import spark.implicits._
    // 5 keys × interleaved left/right times, seeds crossing bucket
    // boundaries (bucket = 100s, right rows only every 370s)
    val left = spark.range(2000).select(pmod(col("id"), lit(5)).as("k"),
      (col("id") * 13 % 7000).as("t"))
    val right = spark.range(120).select(pmod(col("id"), lit(5)).as("k"),
      (col("id") * 370 % 7000).as("rt"), (col("id") * 3).cast("double").as("v"))
      .groupBy("k", "rt").agg(max("v").as("v")) // unique (k, rt)

    val plain = AsOf.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    val bucketed = AsOf.asofJoinBucketed(left, right, Seq("k"), "t", "rt",
      Seq("v"), bucketSec = 100L)
    val got = bucketed.collect().map(r => (r.getLong(0), r.getLong(1),
      Option(r.get(2)), Option(r.get(3)))).toSet
    assert(got == plain)

    // the hot-key defense: the final ride-forward window partitions on
    // (key, bucket), never the bare key
    val plan = bucketed.queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.exists(_.contains("__bk")),
      s"final window not bucket-partitioned:\n${windowLines.mkString("\n")}")
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
