package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Batched BM25 retrieval ([[TextStats.keywordTopK]]) and
  * reciprocal-rank fusion ([[Similarity.rrfFuse]]) — engine-match is
  * covered by the `d_keyword_topk`/`d_hybrid_rrf` oracles; this pins
  * retrieval semantics and the fusion arithmetic.
  */
class HybridSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("keywordTopK: term overlap ranks, self excluded, null text out of corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark joins shuffle data across executors"),
      (1L, "spark joins and spark shuffles"),     // shares spark+joins
      (2L, "joins of relational data"),           // shares joins+data
      (3L, "cooking pasta with tomato sauce"),    // shares nothing
      (4L, null.asInstanceOf[String]))            // out of the corpus
      .toDF("doc_id", "text")
    val out = TextStats.keywordTopK(docs, docs.where(col("doc_id") === 0), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    // docs 1 and 2 retrieved, doc 3 has zero overlap → absent,
    // doc 0 (self) and doc 4 (null) absent
    assert(out.map(_._1).toSet == Set(1L, 2L))
    assert(out.forall(_._2 > 0))
  }

  test("keywordTopK: higher tf of a shared term outranks at equal df") {
    import spark.implicits._
    val docs = Seq(
      (0L, "needle"),
      (1L, "needle needle needle hay hay hay"),
      (2L, "needle hay hay hay hay hay"))
      .toDF("doc_id", "text")
    val out = TextStats.keywordTopK(docs, docs.where(col("doc_id") === 0), k = 2)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(out.head == 1L, "tf=3 must outrank tf=1 for the same term")
  }

  test("hashedVectors: matches a local md5 replay; cancelled buckets drop") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta alpha"),
      (1L, "Gamma gamma DELTA"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextStats.hashedVectors(docs, dim = 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    def pos(t: String) = Sampling.hashBits60Local(t + "|hepos") % 16
    def sgn(t: String) = if (Sampling.hashBits60Local(t + "|hesign") % 2 == 0) 1L else -1L
    val want = collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    for ((id, ts) <- Seq(0L -> Seq("alpha", "beta", "alpha"),
        1L -> Seq("gamma", "gamma", "delta")); t <- ts)
      want((id, pos(t))) += sgn(t)
    assert(got == want.filter(_._2 != 0).toMap)
  }

  test("hashedKnn: a verbatim copy is the top neighbor at cosine 1") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps"),
      (1L, "the quick brown fox jumps"), // exact copy of 0
      (2L, "a completely different sentence here"),
      (3L, "the quick brown cat sleeps")).toDF("doc_id", "text")
    val out = TextStats.hashedKnn(docs, docs.where(col("doc_id") === 0), dim = 32, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(out.head == (1L, 1.0), "identical text must rank first at sim 1")
    assert(out.map(_._1).contains(3L), "shared-token doc must appear")
    assert(!out.map(_._1).contains(0L), "self excluded")
  }

  test("hashedKnn: only positively-similar neighbors are returned (pruning soundness)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextStats.hashedKnn(
      docs, docs.where(col("doc_id") < 5), dim = 64, k = 5).collect()
    assert(out.nonEmpty)
    // the dot > 0 cutoff is what makes skipping zero-overlap docs a
    // sound pruning: every returned sim must be strictly positive
    assert(out.forall(_.getDouble(3) > 0), "a sim ≤ 0 row escaped the cutoff")
  }

  test("clusterTerms: cluster-exclusive vocabulary outranks shared vocabulary") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark spark shuffle the the"),
      (1L, "spark shuffle executor the"),
      (2L, "pasta tomato basil the the"),
      (3L, "pasta olive basil the")).toDF("doc_id", "text")
    val asg = Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L))
      .toDF("doc_id", "centroid_id")
    val out = TextStats.clusterTerms(docs, asg, topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val top = out.groupBy(_._1).map { case (c, rs) =>
      c -> rs.sortBy(_._2).map(_._3)
    }
    // "the" appears everywhere (low idf) and must not label either
    // cluster; exclusive terms do
    assert(top(0L).head == "spark" && !top(0L).contains("the"))
    assert(Set("pasta", "basil").contains(top(1L).head) && !top(1L).contains("the"))
  }

  test("rrfFuse: 3-list fusion is invariant to list order (grid contributions)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val lists = (0 until 3).map { _ =>
      (1L to 3L).flatMap { q =>
        rnd.shuffle((10L to 40L).toList).take(15).zipWithIndex
          .map { case (id, i) => (q, (i + 1).toLong, id) }
      }.toDF("query_id", "rank", "id")
    }
    def run(ls: Seq[org.apache.spark.sql.DataFrame]) =
      Similarity.rrfFuse(ls, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val a = run(lists)
    val b = run(lists.reverse)
    assert(a == b, "fused ranking must not depend on the order lists are passed")
  }

  test("rrfFuse: both-list members beat single-list, contributions exact, ties to lowest id") {
    import spark.implicits._
    val a = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L))
      .toDF("query_id", "rank", "id")
    val b = Seq((1L, 1L, 11L), (1L, 2L, 20L))
      .toDF("query_id", "rank", "id")
    val out = Similarity.rrfFuse(Seq(a, b), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    def g30(x: Double) = math.floor(x * 1073741824.0) / 1073741824.0
    def c(r: Int) = g30(1.0 / (60 + r))
    // 11 is rank 2 in a AND rank 1 in b → fused top
    assert(out(0)._2 == 11L && out(0)._4 == 2L)
    val want11 = BigDecimal(c(2) + c(1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0)._3 == want11)
    // 10 (rank 1, one list) vs 20 (rank 2 in b): 1/61 > 1/62
    assert(out(1)._2 == 10L && out(2)._2 == 20L && out(3)._2 == 12L)
    // equal single-list ranks tie → lowest id first: give 12 and 20
    // the same contribution check via ordering above
    assert(out.map(_._4).toSeq == Seq(2L, 1L, 1L, 1L))
  }
}
