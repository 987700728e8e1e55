package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Stream-stream windowed join: in-window pairs emit, out-of-window
  * pairs never do, and the watermark+range state contract holds
  * (the query reports evictable join state).
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("conversions join their impression within the window; outside never") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long)]   // (user, t-seconds)
    val convs = MemoryStream[(Long, Long)]
    val l = imps.toDF().select(col("_1").as("user_id"),
      timestamp_seconds(col("_2")).as("imp_t"))
    val r = convs.toDF().select(col("_1").as("user_id"),
      timestamp_seconds(col("_2")).as("conv_t"))
    val joined = StreamJoin.within(l, r, "user_id", "imp_t", "conv_t",
      windowSec = 3600L, latenessSec = 60L)

    val name = s"sj_out_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // times stay within one watermark span: nothing here may be
      // dropped as late — absence below must mean join semantics
      imps.addData(Seq((1L, 1000L), (2L, 1000L), (3L, 1100L)))
      q.processAllAvailable()
      convs.addData(Seq(
        (1L, 2000L), // within 1h of user 1's impression → joins
        (2L, 9000L), // 8000s later → outside the window
        (3L, 1050L)  // BEFORE the impression → no match
      ))
      q.processAllAvailable()

      val rows = spark.table(name)
        .select(col("user_id"),
          unix_timestamp(col("imp_t")).as("it"),
          unix_timestamp(col("conv_t")).as("ct"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 1000L, 2000L)))

      // the state contract: Spark accepted the join as watermark-
      // evictable (stream-stream join state operator present, with a
      // watermark set, rather than an analysis error or unbounded plan)
      val prog = q.lastProgress
      assert(prog.stateOperators.nonEmpty, "expected join state operator")
      assert(prog.eventTime.containsKey("watermark"),
        "expected a propagated watermark")
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }
}
