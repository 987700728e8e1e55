package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Margin-criterion pair mining: ratio margin normalizes hubness,
  * each query keeps its single best-margin candidate, and the scorer
  * is edge-agnostic (any (query_id, neighbor_id, sim) relations).
  */
class MarginMineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("hub neighbors are demoted; best pair per query; margin formula exact") {
    import spark.implicits._
    // query 1: candidates 10 (sim .9) and 11 (sim .8).
    //   fwd avg for 1 = (.9+.8)/2 = .85
    //   10 is a HUB: its backward kNN avg is high (.9) → margin(1,10)
    //     = 2·.9/(.85+.9) = 1.0286
    //   11 is not: backward avg .5 → margin(1,11) = 2·.8/(.85+.5) = 1.1852
    //   → 11 wins despite lower raw sim (the hubness correction).
    val fwd = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.8),
      (2L, 10L, 0.4), (2L, 11L, 0.3)).toDF("query_id", "neighbor_id", "sim")
    val bwd = Seq(
      (10L, 1L, 0.9), (10L, 2L, 0.9),
      (11L, 1L, 0.5), (11L, 2L, 0.5)).toDF("query_id", "neighbor_id", "sim")
    val out = Similarity.marginMine(fwd, bwd)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out(1L)._1 == 11L, s"hub should lose: $out")
    assert(math.abs(out(1L)._2 - 1.1852) < 1e-9)
    // query 2: fwd avg .35; margin(2,10)=2*.4/(.35+.9)=0.64,
    // margin(2,11)=2*.3/(.35+.5)=0.7059 → 11, below the accept bar
    assert(out(2L)._1 == 11L)
    assert(out(2L)._2 < 1.0)
    assert(out.size == 2)
  }

  test("maxSim: per-term max then per-doc sum, hand-checked late interaction") {
    import spark.implicits._
    // doc group 10 holds the perfect match for EACH query vec; group
    // 20 holds one mediocre vector (cos .8 with q1, .6 with q2) twice
    // — MaxSim must pick per-TERM maxima and sum them
    val e1 = Seq(1.0f, 0.0f); val e2 = Seq(0.0f, 1.0f)
    val mid = Seq(0.8f, 0.6f) // cos with e1 = .8, with e2 = .6
    val docs = Seq(
      (10L, 100L, e1), (10L, 101L, e2),   // perfect per-term matches
      (20L, 200L, mid), (20L, 201L, mid)
    ).toDF("group_id", "vec_id", "embedding")
    val queries = Seq((0L, 1L, e1), (0L, 2L, e2))
      .toDF("group_id", "vec_id", "embedding")
    val out = Similarity.maxSim(docs, queries, k = 2)
      .collect().map(r => (r.getLong(2), (r.getLong(1), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(out(10L) == ((1L, 2.0, 2L)), s"got $out")   // 1.0 + 1.0
    assert(out(20L) == ((2L, 1.4, 2L)), s"got $out")   // .8 + .6
  }

  test("registered e_bitext_margin: accepted pairs cross the parity split, margin > 1") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = vecs.where(pmod(col("vec_id"), lit(2)) === 0)
    val b = vecs.where(pmod(col("vec_id"), lit(2)) === 1)
    val out = Similarity.marginMine(
      Similarity.bruteKnn(b, a, k = 4),
      Similarity.bruteKnn(a, b, k = 4))
      .where(col("margin") > 1.0)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) % 2 == 0 && r.getLong(1) % 2 == 1)
      assert(r.getDouble(3) > 1.0)
    }
    // one pair per query at most
    assert(out.map(_.getLong(0)).distinct.length == out.length)
  }
}
