package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Full Lloyd's-loop trainer ([[Similarity.kmeansTrain]]) against an
  * independent driver-side replay of the same deterministic contract
  * (lowest-id init, cosine/lowest-cid assignment, 2^-20-floored
  * means, empty clusters keep their centroid).
  */
class KmeansTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def q20(x: Double): Double = math.floor(x * 1048576.0) / 1048576.0

  private def cos(a: Array[Float], c: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nc = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble
      dot += x * c(i); na += x * x; nc += c(i) * c(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nc))
  }

  /** Driver-side Lloyd replay; returns (trace, final centroids). */
  private def localTrain(
      vs: Seq[(Long, Array[Float])],
      k: Int,
      iters: Int): (Seq[(Long, Long, Long, Double)], Array[Array[Double]]) = {
    var cents = vs.sortBy(_._1).take(k).map(_._2.map(_.toDouble)).toArray
    val trace = Seq.newBuilder[(Long, Long, Long, Double)]
    for (it <- 1 to iters) {
      val asg = vs.map { case (_, v) =>
        ((0 until k).maxBy(j => (cos(v, cents(j)), -j)), v)
      }
      val next = cents.map(_.clone())
      for (j <- 0 until k) {
        val members = asg.collect { case (cid, v) if cid == j => v }
        if (members.nonEmpty)
          for (p <- cents(j).indices)
            next(j)(p) = q20(members.map(_(p).toDouble).sum / members.size)
      }
      cents = next
      for (j <- 0 until k; p <- cents(j).indices)
        trace += ((it.toLong, j.toLong, p.toLong, cents(j)(p)))
    }
    (trace.result(), cents)
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  test("kmeansTrain trace and final centroids match a driver-side Lloyd replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // two separated blobs plus scatter, dim 4
    val vs: Seq[(Long, Array[Float])] = (0L until 30L).map { id =>
      val base =
        if (id % 3 == 0) Array(1f, 0.1f, 0f, 0.2f)
        else if (id % 3 == 1) Array(0f, 1f, 0.3f, 0f)
        else Array(0.4f, 0.4f, 1f, 0.5f)
      (id, base.map(b => b + rnd.nextFloat() * 0.2f))
    }
    val df = vs.toDF("vec_id", "embedding")
    val (traceDf, centDf) = Similarity.kmeansTrain(df, k = 3, iters = 3)
    val got = traceDf.collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3)))
      .toMap
    val (want, wantCents) = localTrain(vs, k = 3, iters = 3)
    assert(got.size == 3 * 3 * 4)
    want.foreach { case (it, j, p, m) =>
      assert(got((it, j, p)) == r6(m), s"trace ($it,$j,$p)")
    }
    val gotCents = centDf.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    for (j <- 0 until 3)
      assert(gotCents(j.toLong).sameElements(wantCents(j)), s"final centroid $j")
  }

  test("an empty cluster keeps its previous centroid across iterations") {
    import spark.implicits._
    // vec 0 and vec 1 are identical → every point ties between
    // centroids 0 and 1 at iteration 1 and the lowest cid wins, so
    // cluster 1 is empty forever and its centroid must stay at init
    val vs: Seq[(Long, Array[Float])] = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f)),
      (3L, Array(0.8f, 0.2f, 0.1f)))
    val (traceDf, _) = Similarity.kmeansTrain(vs.toDF("vec_id", "embedding"), k = 2, iters = 2)
    val rows = traceDf.where("centroid_id = 1").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val init = vs(1)._2.map(_.toDouble)
    for (it <- 1L to 2L; p <- init.indices)
      assert(rows((it, p.toLong)) == r6(init(p)), s"iter $it pos $p")
  }

  test("each iteration is one aggregate query: constant ≤2-job delta per iteration") {
    import spark.implicits._
    val vs = (0L until 40L).map(id =>
      (id, Array.tabulate(4)(i => ((id * 7 + i * 3) % 11).toFloat / 11f)))
    val df = vs.toDF("vec_id", "embedding")
    def countJobs(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          n.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try { body; Thread.sleep(1000) } // listener bus drains async
      finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    val j1 = countJobs(Similarity.kmeansTrain(df, k = 4, iters = 1))
    val j3 = countJobs(Similarity.kmeansTrain(df, k = 4, iters = 3))
    // each extra iteration adds exactly one aggregate query — AQE
    // surfaces it as a map job + a reduce job, never more (a
    // join+window assignment would add a by-id exchange on top)
    assert(j3 - j1 == 4 || j3 - j1 == 2,
      s"per-iteration job delta not constant ≤2: iters=1 → $j1 jobs, iters=3 → $j3")
  }
}
