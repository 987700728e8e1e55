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

  test("IVF-shortlisted mining equals brute where bitext structure exists") {
    import spark.implicits._
    // 4 well-separated clusters ("languages of one topic"): 10 vectors
    // each, true pairs = (even 2k, odd 2k+1) sharing a jitter so the
    // translation is each vector's clear nearest cross-parity
    // neighbor. With >= 4 opposite-parity members per cluster, both
    // the brute and the cell-probed top-4 lists stay within-cluster,
    // so the shortlisted miner reproduces brute EXACTLY at nprobe=1.
    // (On the unstructured random fixture embeddings, pair recall
    // needs nprobe -> nlist — measured 0.21/0.36/0.52/0.75 at
    // nprobe 2/4/8/16 of 32 cells, DriveScratch `bitext` — which is
    // the expected ANN behavior when no pair structure exists.)
    def basis(c: Int, v: Float): Seq[Float] =
      Seq.tabulate(4)(i => if (i == c) v else 0f)
    val vecs = (for {
      id <- 0L until 40L
      c = (id / 10).toInt
      k = (id % 10) / 2           // pair index inside the cluster
      jitter = 0.02f * (k + 1) + (if (id % 2 == 1) 0.001f else 0f)
    } yield (id, basis(c, 1f).zip(basis((c + 1) % 4, jitter)).map(t => t._1 + t._2)))
      .toDF("vec_id", "embedding")
    val a = vecs.where(pmod(col("vec_id"), lit(2)) === 0)
    val b = vecs.where(pmod(col("vec_id"), lit(2)) === 1)
    val brute = Similarity.marginMine(
        Similarity.bruteKnn(b, a, k = 4), Similarity.bruteKnn(a, b, k = 4))
      .where(col("margin") > 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    val centroids = (0 until 4).map(c => (c.toLong, basis(c, 1f)))
      .toDF("centroid_id", "centroid")
    def side(stored: org.apache.spark.sql.DataFrame,
             queries: org.apache.spark.sql.DataFrame) =
      Similarity.ivfSearch(stored, centroids, queries, k = 4, nprobe = 1,
        broadcastProbes = false)
    val mined = Similarity.marginMine(side(b, a), side(a, b))
      .where(col("margin") > 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(brute.nonEmpty)
    assert(mined == brute, s"ivf=${mined.size} brute=${brute.size}")
    // accepted pairs never cross clusters (the shortlist keeps
    // candidate generation inside the probed cell; which same-cluster
    // member wins the margin is the scorer's hubness call — near-
    // parallel jitter makes raw-sim order and margin order differ)
    mined.foreach { case (q, n, _) => assert(n / 10 == q / 10, s"($q,$n)") }
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
