package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming Oja-rule PCA ([[StreamPca]]). */
class StreamPcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def q20(x: Double): Double = math.floor(x * 1048576.0) / 1048576.0

  private def run(
      model: StreamPca.Model,
      batches: Seq[Seq[(Long, Array[Float])]]): Unit = {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-spca").toFile.getAbsolutePath
    val stream = MemoryStream[(Long, Array[Float])]
    val q = stream.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch(StreamPca.updater(model))
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
  }

  test("multi-batch run matches a driver-side Oja replay") {
    val rnd = new scala.util.Random(23)
    val dim = 5
    val all = (0L until 40L).map(id => (id, Array.fill(dim)(rnd.nextFloat() - 0.5f)))
    val batches = all.grouped(10).toSeq
    val model = new StreamPca.Model(dim)
    run(model, batches)
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var n = 0L
    for (b <- batches) {
      val eta = 1.0 / (n + b.length).toDouble
      val u = v.clone()
      for ((_, x) <- b) {
        var p = 0.0
        for (i <- 0 until dim) p += x(i).toDouble * v(i)
        for (i <- 0 until dim) u(i) += eta * x(i).toDouble * p
      }
      val nrm = math.sqrt(u.map(y => y * y).sum)
      v = u.map(y => q20(y / nrm))
      n += b.length
    }
    val (got, gotN) = model.snapshot
    assert(gotN == 40L)
    // the distributed Σ x·(xᵀv) is order-free at the q20 grid
    got.zip(v).zipWithIndex.foreach { case ((a, b2), i) =>
      assert(math.abs(a - b2) <= 1e-6, s"pos $i: $a vs $b2")
    }
  }

  test("tracks a planted dominant direction over batches") {
    val rnd = new scala.util.Random(31)
    val dim = 6
    val dir = Array(0.0, 0.8, 0.0, 0.6, 0.0, 0.0)
    val all = (0L until 600L).map { id =>
      val a = rnd.nextGaussian() * 4.0
      (id, Array.tabulate(dim)(i => (a * dir(i) + rnd.nextGaussian() * 0.2).toFloat))
    }
    val model = new StreamPca.Model(dim)
    run(model, all.grouped(150).toSeq)
    val (v, _) = model.snapshot
    val cos = math.abs(v.zip(dir).map { case (a, b) => a * b }.sum)
    assert(cos > 0.95, s"streamed component misaligned: |cos| = $cos")
  }
}
