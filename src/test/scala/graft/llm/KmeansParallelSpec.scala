package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** k-means|| (Scalable K-Means++) initialization. */
class KmeansParallelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def mkVecs(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("recovers one center per well-separated cluster") {
    // three tight clusters far apart; 30 points each
    val rnd = new scala.util.Random(9)
    val rows = for {
      c <- 0 until 3
      i <- 0 until 30
    } yield ((c * 100 + i).toLong,
      Array(c * 50.0f + rnd.nextFloat(), c * 50.0f + rnd.nextFloat()))
    val out = Similarity.kmeansParallelInit(
        mkVecs(rows), k = 3, rounds = 3, l = 4.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 3)
    val clusters = out.map(_._2 / 100).toSet
    assert(clusters == Set(0L, 1L, 2L),
      s"each cluster must contribute one center, got $out")
    // weights are assignment counts over the FULL candidate set —
    // intra-cluster candidates split their cluster's mass, so chosen
    // centers carry a positive share, not the whole cluster
    assert(out.forall(_._3 >= 1) && out.map(_._3).sum <= 90, s"bad weights: $out")
  }

  test("result is invariant to input partitioning") {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 200L).map(i =>
      (i, Array(rnd.nextFloat() * 10, rnd.nextFloat() * 10, rnd.nextFloat() * 10)))
    def run(parts: Int) = Similarity.kmeansParallelInit(
        mkVecs(rows).repartition(parts), k = 4, rounds = 2, l = 4.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(1) == run(7), "md5-draw init must not depend on partitioning")
  }
}
