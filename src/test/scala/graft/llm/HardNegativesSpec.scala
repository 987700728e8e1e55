package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Hard-negative triplet mining ([[Similarity.hardNegatives]]) —
  * engine-match vs DuckDB is covered by the `e_hard_negatives`
  * oracle; this pins the selection semantics on a hand-built fixture.
  */
class HardNegativesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("per anchor: most-similar same-label positive, top-k wrong-label negatives, margin") {
    import spark.implicits._
    // anchor 0 (label A) at e1; same-label 1 close, 2 farther;
    // wrong-label 3 closest of all (the hard negative), 4 next, 5 far
    val vs = Seq(
      (0L, Array(1f, 0f, 0f), "A"),
      (1L, Array(0.9f, 0.1f, 0f), "A"),
      (2L, Array(0.5f, 0.5f, 0f), "A"),
      (3L, Array(0.95f, 0.05f, 0f), "B"),
      (4L, Array(0.7f, 0.3f, 0f), "B"),
      (5L, Array(0f, 0f, 1f), "B")).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vs, vs.where(col("vec_id") === 0), negK = 2)
      .orderBy("neg_rank").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(0) == 0L && r.getString(1) == "A")
      assert(r.getLong(2) == 1L, "positive = nearest same-label")
    }
    assert(out(0).getLong(5) == 3L, "neg rank 1 = most-similar wrong-label")
    assert(out(1).getLong(5) == 4L)
    // the hardest negative outranks the positive here → margin < 0
    assert(out(0).getDouble(7) < 0)
    assert(out(1).getDouble(7) > 0)
    // margins are pos_sim − neg_sim on the unrounded sims, 4dp output
    assert(out(0).getDouble(3) == out(1).getDouble(3))
  }

  test("anchors with no same-label partner produce no triplets; negK caps negatives") {
    import spark.implicits._
    val vs = Seq(
      (0L, Array(1f, 0f), "solo"),
      (1L, Array(0.9f, 0.1f), "B"),
      (2L, Array(0.8f, 0.2f), "B"),
      (3L, Array(0.7f, 0.3f), "B")).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vs, vs, negK = 2)
    // anchor 0 has no positive → absent; B anchors get ≤2 negatives
    // (only vec 0 is wrong-label for them → exactly 1 each)
    val byAnchor = out.collect().groupBy(_.getLong(0))
    assert(!byAnchor.contains(0L))
    assert(Seq(1L, 2L, 3L).forall(a => byAnchor(a).length == 1))
    assert(byAnchor.values.flatten.forall(_.getLong(5) == 0L))
  }
}
