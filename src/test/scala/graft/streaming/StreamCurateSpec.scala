package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming curation: junk gated out, survivors enriched, in-horizon
  * duplicates dropped — all before anything lands.
  */
class StreamCurateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val goodText =
    ("the quick brown fox jumps over the lazy dog and runs far away " * 4).trim
  private val junkText = "@@ ### $$$$ %% ^^^^ && ** (()) 123 456 789 000"

  test("quality gate drops junk; duplicates dedup; survivors carry lang and tokens") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, String)]
    val input = stream.toDF().select(
      col("_1").as("doc_id"),
      timestamp_seconds(col("_2")).as("event_time"),
      col("_3").as("text"))
    val out = StreamCurate.pipeline(input, col("text"), lateness = "100 seconds")
    val name = s"curate_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    stream.addData(Seq(
      (1L, 100L, goodText),
      (2L, 105L, junkText),        // gated out
      (3L, 110L, goodText),        // duplicate of 1 → dropped
      (4L, 115L, goodText + " extra tail")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name)
      .select("doc_id", "lang", "n_tokens", "p_quality").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    spark.catalog.dropTempView(name)
    assert(rows.map(_._1).toSet == Set(1L, 4L), rows.mkString(", "))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == "en")
    assert(byId(1L)._3 == goodText.split("\\s+").length)
    assert(byId(1L)._4 >= 0.5)
  }

  test("qualityDrift: per-window mean/sd over ALL arrivals, emitted on watermark close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, String)]
    val input = stream.toDF().select(
      col("_1").as("doc_id"),
      timestamp_seconds(col("_2")).as("event_time"),
      col("_3").as("text"))
    val out = StreamCurate.qualityDrift(input, col("text"),
      windowDur = "60 seconds", lateness = "10 seconds")
    val name = s"drift_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    // window [60, 120): one good + one junk doc — junk must be counted
    stream.addData(Seq((1L, 70L, goodText), (2L, 80L, junkText)))
    q.processAllAvailable()
    // advance the watermark far enough to close it
    stream.addData(Seq((3L, 500L, goodText)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).collect()
      .map(r => (r.getTimestamp(0).toInstant.getEpochSecond,
        r.getLong(1), r.getDouble(2)))
    spark.catalog.dropTempView(name)
    assert(rows.length == 1, rows.mkString(", "))
    assert(rows.head._1 == 60L && rows.head._2 == 2L)
    // mean over good+junk sits strictly between the two probabilities
    assert(rows.head._3 > 0.1 && rows.head._3 < 0.9)
  }

  test("state stays bounded: the dedup key expires past the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, String)]
    val input = stream.toDF().select(
      col("_1").as("doc_id"),
      timestamp_seconds(col("_2")).as("event_time"),
      col("_3").as("text"))
    val out = StreamCurate.pipeline(input, col("text"), lateness = "50 seconds")
    val name = s"curate_exp_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    stream.addData(Seq((1L, 100L, goodText)))
    q.processAllAvailable()
    // advance the watermark far past 100 + 50, then re-send the text
    stream.addData(Seq((2L, 1000L, goodText + " other doc")))
    q.processAllAvailable()
    stream.addData(Seq((3L, 1010L, goodText)))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table(name).select("doc_id").collect().map(_.getLong(0)).toSet
    spark.catalog.dropTempView(name)
    // doc 3 re-emits: its key's state was evicted — the declared trade
    assert(ids == Set(1L, 2L, 3L), ids.toString)
  }
}
