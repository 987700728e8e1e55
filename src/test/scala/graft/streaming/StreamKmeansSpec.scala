package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.llm.Similarity

/** Streaming mini-batch k-means ([[StreamKmeans]]). */
class StreamKmeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def q20(x: Double): Double = math.floor(x * 1048576.0) / 1048576.0

  private def run(
      model: StreamKmeans.Model,
      batches: Seq[Seq[(Long, Array[Float])]]): Unit = {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-skm").toFile.getAbsolutePath
    val stream = MemoryStream[(Long, Array[Float])]
    val q = stream.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch(StreamKmeans.updater(model))
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
  }

  test("single-batch stream reproduces kmeansTrain(iters = 1)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vs = (0L until 30L).map(id =>
      (id, Array.fill(4)(rnd.nextFloat() * 2f - 1f)))
    val model = new StreamKmeans.Model(k = 3, dim = 4)
    run(model, Seq(vs))
    val batchTrace = Similarity
      .kmeansTrain(vs.toDF("vec_id", "embedding"), k = 3, iters = 1)._1
      .collect()
      .map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap
    model.snapshot.foreach { case (j, c, _) =>
      c.zipWithIndex.foreach { case (v, p) =>
        val want = batchTrace((j, p.toLong))
        val got = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        assert(got == want, s"centroid $j pos $p: stream $got vs batch $want")
      }
    }
    assert(model.snapshot.map(_._3).sum == 30L)
  }

  test("multi-batch run matches a driver-side mini-batch replay; counts accumulate") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val all = (0L until 48L).map(id =>
      (id, Array.fill(3)(rnd.nextFloat())))
    val batches = all.grouped(16).toSeq
    val model = new StreamKmeans.Model(k = 2, dim = 3)
    run(model, batches)
    // replay: seed = 2 lowest ids of batch 1; per batch, assign
    // against centroids-at-batch-start (cosine desc, lowest cid on
    // ties), fold running means on the q20 grid
    def cos(a: Array[Float], c: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nc = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * c(i); na += a(i).toDouble * a(i); nc += c(i) * c(i)
      }
      d / (math.sqrt(na) * math.sqrt(nc))
    }
    var cents = batches.head.sortBy(_._1).take(2).map(_._2.map(_.toDouble)).toArray
    val counts = Array.fill(2)(0L)
    for (b <- batches) {
      val asg = b.map { case (_, x) => ((0 until 2).maxBy(j => (cos(x, cents(j)), -j)), x) }
      val next = cents.map(_.clone())
      for (j <- 0 until 2) {
        val members = asg.collect { case (cid, x) if cid == j => x }
        if (members.nonEmpty) {
          for (p <- 0 until 3) {
            val s = members.map(_(p).toDouble).sum
            next(j)(p) = q20((cents(j)(p) * counts(j) + s) / (counts(j) + members.length))
          }
        }
      }
      cents = next
      for (j <- 0 until 2)
        counts(j) += asg.count(_._1 == j)
    }
    model.snapshot.foreach { case (j, c, n) =>
      assert(n == counts(j.toInt), s"count $j")
      assert(c.sameElements(cents(j.toInt)), s"centroid $j")
    }
  }

  test("a replayed id among the k lowest rows does not crowd out seed candidates") {
    import spark.implicits._
    val model = new StreamKmeans.Model(k = 2, dim = 2)
    // id 1 delivered twice: seeds must still be {1, 2}, not {1} stuck
    val b = Seq(
      (1L, Array(1f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(0f, 1f)), (5L, Array(0.9f, 0.1f)))
    run(model, Seq(b))
    assert(model.initialized)
    val snap = model.snapshot
    assert(snap.map(_._3).sum == 4L, "all four rows (incl. the replay) assigned")
    // centroid 1 seeded from id 2 = e2 and attracts only id 2 → stays
    // exactly (0, 1); a {1, 5} mis-seed would put ~(0.9, 0.1) here
    assert(snap(1)._2.toSeq == Seq(0.0, 1.0))
  }

  test("pre-init batches buffer the k lowest ids; seeding completes later") {
    import spark.implicits._
    val model = new StreamKmeans.Model(k = 4, dim = 2)
    val b1 = Seq((7L, Array(1f, 0f)), (3L, Array(0f, 1f))) // < k → buffer only
    val b2 = (10L until 20L).map(id => (id, Array(id.toFloat, 1f)))
    run(model, Seq(b1, b2))
    assert(model.initialized)
    assert(model.snapshot.length == 4)
    // the batch completing the seed is assigned in full; the
    // buffered-only batch contributed seeds, not assignments
    assert(model.snapshot.map(_._3).sum == b2.length)
  }
}
