package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming exact dedup: first-seen-wins within the watermark
  * horizon, bounded state, horizon-expired keys may re-emit.
  */
class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(batches: Seq[Seq[(Long, Long, String)]]): Seq[(Long, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, String)]
    val input = stream.toDF().select(
      col("_1").as("doc_id"),
      timestamp_seconds(col("_2")).as("event_time"),
      col("_3").as("text"))
    val out = StreamDedup.firstSeenNormalized(
      input, col("text"), lateness = "100 seconds")
    val name = s"dedup_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val rows = spark.table(name)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  test("duplicates within the horizon are dropped, one copy per key survives") {
    val got = run(Seq(
      // batch 1: A twice (same batch, normalize-equal), B once
      Seq((1L, 100L, "the cat"), (2L, 105L, "THE  cat"), (3L, 110L, "a dog")),
      // batch 2: A again within the horizon -> dropped
      Seq((4L, 130L, "the cat"))))
    val ids = got.map(_._1).toSet
    // exactly one of the three A-copies survives (which one is
    // partition-order within the first micro-batch), plus B
    assert(got.size == 2 && ids.contains(3L) && (ids - 3L).subsetOf(Set(1L, 2L)))
  }

  test("a key re-arriving past the watermark horizon emits again") {
    val got = run(Seq(
      Seq((1L, 100L, "the cat")),
      // advance the watermark far past 100 + lateness
      Seq((2L, 10000L, "unrelated")),
      // state for "the cat" is evicted -> this copy is emitted
      Seq((3L, 10050L, "the cat"))))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L))
  }
}
