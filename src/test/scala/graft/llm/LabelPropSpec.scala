package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Label propagation ([[Similarity.labelPropagate]]) — engine-match
  * is covered by the `e_label_prop` oracle; this pins the vote
  * semantics on a hand graph.
  */
class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("chain propagation, immutable seeds, majority with lowest-label ties, unreachable stay unlabeled") {
    import spark.implicits._
    // 1 ← seed(A). chain 1→2→3 reaches 3 only in round 2.
    // node 4 sees seeds A(1) and B(5): tie → lowest label wins.
    // node 9 has no edges to labeled nodes → never labeled.
    val edges = Seq(
      (2L, 1L), (3L, 2L),        // chain
      (4L, 1L), (4L, 5L),        // tie voter
      (1L, 2L),                  // seed 1 must NOT be relabeled
      (9L, 8L)).toDF("src", "dst") // dst 8 never labeled
    val seeds = Seq((1L, 10L), (5L, 20L)).toDF("id", "label")
    val out = Similarity.labelPropagate(edges, seeds, rounds = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (10L, 0L), "seed immutable at round 0")
    assert(out(5L) == (20L, 0L))
    assert(out(2L) == (10L, 1L), "direct neighbor labels in round 1")
    assert(out(3L) == (10L, 2L), "chain end labels in round 2")
    assert(out(4L) == (10L, 1L), "1-1 tie goes to the lowest label")
    assert(!out.contains(9L), "no labeled neighbor -> stays unlabeled")
    assert(out.size == 5)
  }

  test("lshBitsPlan: corpus-adaptive bits, SQL CASE in lockstep") {
    // rule: 2^bits >= n/32 (expected bucket <= 32 vectors), floored
    assert(Similarity.lshBitsPlan(500L, floor = 4) == 4)     // sf0.01 unchanged
    assert(Similarity.lshBitsPlan(500L, floor = 8) == 8)     // e_lsh_knn fixture
    assert(Similarity.lshBitsPlan(2000L, floor = 4) == 6)
    assert(Similarity.lshBitsPlan(20000L, floor = 4) == 10)
    assert(Similarity.lshBitsPlan(200000L, floor = 4) == 13)
    assert(Similarity.lshBitsPlan(1L << 40, floor = 4) == 20) // capped
    for (floor <- Seq(4, 8);
         n <- Seq(1L, 2L, 500L, 512L, 513L, 2000L, 20000L, 200000L,
           1L << 25, 1L << 40)) {
      val sql = Similarity.lshBitsPlanSqlCase(n.toString, floor = floor)
      val got = spark.sql(s"SELECT $sql AS b").head().get(0).toString.toInt
      assert(got == Similarity.lshBitsPlan(n, floor = floor),
        s"floor=$floor n=$n")
    }
    // floor >= cap degenerates to zero CASE branches: the emitter must
    // produce a bare constant matching the Scala twin, not invalid SQL
    val bare = Similarity.lshBitsPlanSqlCase("n", floor = 20, cap = 20)
    assert(!bare.contains("CASE"))
    assert(bare == Similarity.lshBitsPlan(5L, floor = 20, cap = 20).toString)
  }

  test("ivfPlan: sqrt-rule cell count, power of two, floored and capped") {
    assert(Similarity.ivfPlan(1L) == 8)
    assert(Similarity.ivfPlan(64L) == 8)
    assert(Similarity.ivfPlan(500L) == 32)      // sqrt=22.4 -> 32
    assert(Similarity.ivfPlan(1024L) == 32)     // sqrt=32 exactly
    assert(Similarity.ivfPlan(1000000L) == 1024)
    assert(Similarity.ivfPlan(100000000L) == 16384)
    assert(Similarity.ivfPlan(Long.MaxValue / 4) == (1 << 18)) // capped
  }

  test("ivfPlanSqlCase evaluates identically to ivfPlan (oracle-twin lockstep)") {
    for (n <- Seq(1L, 63L, 64L, 65L, 256L, 257L, 500L, 1024L, 1025L,
      1000000L, 100000000L, 1L << 36, Long.MaxValue / 4)) {
      val sql = Similarity.ivfPlanSqlCase(n.toString)
      val got = spark.sql(s"SELECT $sql AS nlist").head().get(0).toString.toInt
      assert(got == Similarity.ivfPlan(n), s"n=$n sql=$got scala=${Similarity.ivfPlan(n)}")
    }
    // degenerate floor >= cap emits the bare constant, like the other
    // emitters in the sizing-rule family
    val bare = Similarity.ivfPlanSqlCase("n", floor = 8, cap = 8)
    assert(!bare.contains("CASE") && bare == "8")
  }

  test("nprobePlan: recall-targeted probes, clamped, SQL in lockstep") {
    // the measured anchor (SCALE_NOTES finding 10): recall 0.75 at
    // nprobe 16 of nlist 32 — ServeRecallTarget = 0.7 reproduces it
    assert(Similarity.nprobePlan(32, Similarity.ServeRecallTarget) == 16)
    // the registered fixture operating points
    assert(Similarity.nprobePlan(8, Similarity.ServeRecallTarget) == 4)
    assert(Similarity.nprobePlan(4, Similarity.ServeRecallTarget) == 2)
    assert(Similarity.nprobePlan(128, Similarity.ServeRecallTarget) == 63)
    // target 1 degenerates to the exhaustive scan (exact recall)
    assert(Similarity.nprobePlan(32, 1.0) == 32)
    // floor clamp: a tiny target still probes one cell
    assert(Similarity.nprobePlan(32, 0.01) == 1)
    assert(Similarity.impliedRecallFloor(32, 32) == 1.0)
    assert(math.abs(Similarity.impliedRecallFloor(2, 32) - 0.25) < 1e-12)
    for (nlist <- Seq(1, 2, 4, 8, 32, 100, 128, 1024, 1 << 18);
         t <- Seq(0.01, 0.25, 0.5, 0.7, 0.9, 0.99, 1.0)) {
      val sql = Similarity.nprobePlanSql(nlist.toString, t)
      val got = spark.sql(s"SELECT $sql AS np").head().get(0).toString.toInt
      assert(got == Similarity.nprobePlan(nlist, t), s"nlist=$nlist t=$t")
    }
    // composes with the ivfPlan CASE (the twin shape the gated
    // queries emit): rule(nlist-of-n) end to end
    for (n <- Seq(1L, 500L, 2000L, 1000000L)) {
      val sql = Similarity.nprobePlanSql(
        Similarity.ivfPlanSqlCase(n.toString), Similarity.ServeRecallTarget)
      val got = spark.sql(s"SELECT $sql AS np").head().get(0).toString.toInt
      assert(got == Similarity.nprobePlan(
        Similarity.ivfPlan(n), Similarity.ServeRecallTarget), s"n=$n")
    }
  }
}
