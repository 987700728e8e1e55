package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming z-scores: burn-in trains silently, outliers flag against
  * the running per-type distribution, state survives micro-batches.
  */
class StreamAnomalySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(batches: Seq[Seq[(String, Long, Double)]],
      minN: Long): Seq[(String, Long, Double, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long, Double)]
    val input = stream.toDF().select(
      col("_1").as("event_type"), col("_2").as("t"), col("_3").as("value"))
    val out = StreamAnomaly.zscores(input, minN = minN, threshold = 3.0)
    val name = s"anom_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val rows = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  // 10 alternating values around 10 (sd stays ~0.53): enough variance
  // to divide by, far from the spike
  private def training(n: Int): Seq[(String, Long, Double)] =
    (0 until n).map(i => ("cpu", i.toLong, 10.0 + (if (i % 2 == 0) 0.5 else -0.5)))

  test("outlier flags after burn-in; training values never flag") {
    val got = run(Seq(training(10), Seq(("cpu", 100L, 50.0))), minN = 10)
    assert(got.map(t => (t._1, t._2, t._3)) == Seq(("cpu", 100L, 50.0)))
    assert(got.head._4 > 3.0)
  }

  test("burn-in: the same outlier inside the minimum count trains silently") {
    val got = run(Seq(training(5), Seq(("cpu", 100L, 50.0))), minN = 10)
    assert(got.isEmpty)
  }

  test("state persists across batches and types are independent") {
    val got = run(Seq(
      training(10),
      (0 until 10).map(i => ("disk", i.toLong, 1000.0 + (if (i % 2 == 0) 1.0 else -1.0))),
      // cpu's spike flags against cpu's stats; disk's normal value doesn't
      Seq(("cpu", 200L, 50.0), ("disk", 200L, 1001.0))), minN = 10)
    assert(got.map(_._1) == Seq("cpu"))
  }

  test("within-batch ordering: the spike scores against earlier rows of the same batch") {
    // all in ONE batch: the t-sorted fold must train on the first 10
    // and flag the last row
    val got = run(Seq(training(10) ++ Seq(("cpu", 100L, 50.0))), minN = 10)
    assert(got.map(_._2) == Seq(100L))
  }
}
