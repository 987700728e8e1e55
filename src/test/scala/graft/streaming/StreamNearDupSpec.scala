package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming MinHash near-dup: band-collision candidates within the
  * watermark horizon, owner-first-wins, horizon-expired bands forget.
  */
class StreamNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // 12-word base text → near-dup differs in one word (high jaccard),
  // unrelated shares no 5-shingle
  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val near = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
  private val far  = "one two three four five six seven eight nine ten eleven twelve"

  private def run(
      batches: Seq[Seq[(Long, Long, String)]]): Seq[(Long, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, String)]
    val input = stream.toDF().select(
      col("_1").as("doc_id"),
      timestamp_seconds(col("_2")).as("event_time"),
      col("_3").as("text"))
    val out = StreamNearDup.candidates(
      input, col("text"), col("doc_id"),
      lateness = "100 seconds", horizonSec = 600L)
    val name = s"neardup_out_${System.nanoTime()}"
    val q = out.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val rows = spark.table(name)
      .select("doc_id", "first_id", "est_jaccard").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  test("a near-duplicate arriving within the horizon is flagged; unrelated is not") {
    val got = run(Seq(
      Seq((1L, 100L, base), (2L, 110L, far)),
      Seq((3L, 130L, near))))
    // doc 3 collides with doc 1 on at least one band, never with 2
    assert(got.nonEmpty)
    assert(got.forall { case (d, f, _) => d == 3L && f == 1L })
    // the jaccard estimate is high for a one-word edit
    assert(got.forall(_._3 >= 0.5), got.toString)
  }

  test("an exact copy estimates jaccard 1.0 on every colliding band") {
    val got = run(Seq(
      Seq((1L, 100L, base)),
      Seq((2L, 120L, base))))
    assert(got.nonEmpty && got.forall(c => c._1 == 2L && c._2 == 1L && c._3 == 1.0))
  }

  test("the band store forgets past the horizon — no flag, state bounded") {
    val got = run(Seq(
      Seq((1L, 100L, base)),
      // push the watermark far past 100 + horizon (600s)
      Seq((2L, 5000L, far)),
      // doc 1's bands are evicted: the copy re-registers silently
      Seq((3L, 5050L, base))))
    assert(got.forall(_._1 != 3L), got.toString)
  }

  test("a stale owner expires at ARRIVAL even when the watermark lags a batch") {
    // no intermediate batch: the watermark at batch 2 is still 0, so
    // only the arrival-time horizon check can expire doc 1's bands
    val got = run(Seq(
      Seq((1L, 100L, base)),
      Seq((3L, 5050L, base))))
    assert(got.isEmpty, got.toString)
    // and the late doc re-registered: a third copy within ITS horizon
    // pairs against it, not against the long-gone doc 1
    val got2 = run(Seq(
      Seq((1L, 100L, base)),
      Seq((3L, 5050L, base)),
      Seq((4L, 5100L, base))))
    assert(got2.nonEmpty && got2.forall(c => c._1 == 4L && c._2 == 3L),
      got2.toString)
  }

  test("same-batch near-dups pair against the earliest doc in the batch") {
    val got = run(Seq(Seq((5L, 100L, base), (4L, 90L, near))))
    // 4 is earlier → owns the bands; 5 pairs against 4
    assert(got.nonEmpty && got.forall(c => c._1 == 5L && c._2 == 4L))
  }
}
