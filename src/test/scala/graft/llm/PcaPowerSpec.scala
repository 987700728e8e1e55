package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Power-iteration PCA ([[Similarity.pcaPowerTrain]]) — engine-match
  * vs DuckDB is covered by the `e_pca_power`/`e_pca_project`
  * oracles; this pins the math against an independent local replay
  * and the recovery of a planted dominant direction.
  */
class PcaPowerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def q20(x: Double): Double = math.floor(x * 1048576.0) / 1048576.0

  test("trace matches a local Gram + power-iteration replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val dim = 6
    val vs = (0L until 25L).map { id =>
      (id, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }
    val df = vs.toDF("vec_id", "embedding")
    val (traceDf, vFinal) = Similarity.pcaPowerTrain(df, dim = dim, iters = 3)
    // independent replay: local Gram (same q20 grid), same loop
    val g = Array.ofDim[Double](dim, dim)
    for ((_, x) <- vs; i <- 0 until dim; j <- 0 until dim)
      g(i)(j) += x(i).toDouble * x(j).toDouble
    for (i <- 0 until dim; j <- 0 until dim) g(i)(j) = q20(g(i)(j))
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    val got = traceDf.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (it <- 1 to 3) {
      val u = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * v(j)).sum)
      val nrm = math.sqrt(u.map(x => x * x).sum)
      v = u.map(x => q20(x / nrm))
      for (p <- 0 until dim) {
        val want = BigDecimal(v(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        assert(got((it.toLong, p.toLong)) == want, s"iter $it pos $p")
      }
    }
    assert(vFinal.sameElements(v))
  }

  test("pcaTop2: deflation recovers the second planted direction, near-orthogonal") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 8
    val d1 = Array(1.0, 0, 0, 0, 0, 0, 0, 0)
    val d2 = Array(0, 1.0, 0, 0, 0, 0, 0, 0)
    val vs = (0L until 120L).map { id =>
      val a = rnd.nextGaussian() * 6.0 // dominant
      val b = rnd.nextGaussian() * 3.0 // second
      (id, Array.tabulate(dim)(i =>
        (a * d1(i) + b * d2(i) + rnd.nextGaussian() * 0.15).toFloat))
    }
    val (comps, v1, v2) = Similarity.pcaTop2(vs.toDF("vec_id", "embedding"), dim = dim, iters = 10)
    assert(comps.count() == 2 * dim)
    def cosAbs(a: Array[Double], b: Array[Double]) =
      math.abs(a.zip(b).map { case (x, y) => x * y }.sum)
    assert(cosAbs(v1, d1) > 0.98, s"v1 misaligned: ${cosAbs(v1, d1)}")
    assert(cosAbs(v2, d2) > 0.95, s"v2 misaligned: ${cosAbs(v2, d2)}")
    assert(cosAbs(v1, v2) < 0.05, s"components not orthogonal: ${cosAbs(v1, v2)}")
  }

  test("recovers a planted dominant direction") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val dim = 8
    val dir = Array(0.6, 0.0, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0) // unit
    val vs = (0L until 60L).map { id =>
      val a = rnd.nextGaussian() * 5.0 // strong signal along dir
      (id, Array.tabulate(dim)(i => (a * dir(i) + rnd.nextGaussian() * 0.3).toFloat))
    }
    val (_, v) = Similarity.pcaPowerTrain(vs.toDF("vec_id", "embedding"), dim = dim, iters = 8)
    val cos = math.abs(v.zip(dir).map { case (a, b) => a * b }.sum)
    assert(cos > 0.98, s"top component misaligned: |cos| = $cos")
  }
}
