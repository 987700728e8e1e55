package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The streaming session operator must agree with the batch window
  * query (`ev_sessionize`'s lag/sum-over-window construction — the
  * oracle-checked semantics) once every session is closed.
  */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** (user, t) events: u1 has two sessions (gap > 1800 between t=3000
    * and t=6000); u2 one session; u3 a single event.
    */
  private val events = Seq(
    (1L, 1000L), (1L, 2000L), (1L, 3000L),
    (1L, 6000L), (1L, 6100L),
    (2L, 500L), (2L, 2200L),
    (3L, 9000L))

  private def batchSessions: Set[(Long, Long, Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val ev = events.toDF("user_id", "t")
    val w = Window.partitionBy("user_id").orderBy("t")
    ev.withColumn("new_session",
        when(col("t") - lag(col("t"), 1).over(w) > 1800 ||
          lag(col("t"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("t").as("start"), max("t").as("end"), count(lit(1)).as("n"))
      .select("user_id", "start", "end", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("streaming sessions equal the batch window sessions once closed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val input = stream.toDF().select(
      col("_1").as("user_id"),
      timestamp_seconds(col("_2")).as("event_time"),
      col("_2").as("t"))
    val out = Sessionize.sessions(input, gapSec = 1800L, lateness = "10 seconds")
    val q = out.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()

    // batch 1: the real events; batch 2: a far-future sentinel for an
    // unrelated user advances the watermark past every open session's
    // timeout; batch 3: a second sentinel guarantees a batch RUNS at
    // that watermark so the timeouts fire (timeout checks happen
    // against the previous batch's watermark — relying on the no-data
    // micro-batch would be a race)
    stream.addData(events)
    q.processAllAvailable()
    stream.addData((99L, 1000000L))
    q.processAllAvailable()
    stream.addData((99L, 2000000L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions_out")
      .where(col("user_id") =!= 99L)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == batchSessions, s"got $got, want $batchSessions")
  }

  test("a gap inside one micro-batch closes the earlier session immediately") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val input = stream.toDF().select(
      col("_1").as("user_id"),
      timestamp_seconds(col("_2")).as("event_time"),
      col("_2").as("t"))
    val out = Sessionize.sessions(input, gapSec = 100L, lateness = "1 second")
    // out-of-order arrival within the batch: 5000 before 10
    stream.addData(Seq((7L, 5000L), (7L, 10L), (7L, 50L)))
    val q = out.writeStream.format("memory").queryName("gap_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination()
    val got = spark.table("gap_out")
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the (10, 50) session closed by the in-batch gap; (5000) still open
    assert(got.toSet == Set((7L, 10L, 50L, 2L)))
  }
}
