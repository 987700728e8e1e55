package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** PageRank fixed-point semantics on hand-computable graphs, and
  * TextRank's co-occurrence edge construction.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("one iteration on the a-b-c path graph matches hand-computed values") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c")).toDF("x", "y")
    val out = Graph.pagerank(edges, col("x"), col("y"), iters = 1)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    // n=3, uniform 1/3; a receives b's 1/3 / deg 2, b receives 1/3+1/3
    assert(out("a") == ((0.191667, 1L)))
    assert(out("b") == ((0.616667, 2L)))
    assert(out("c") == ((0.191667, 1L)))
  }

  test("rank mass is conserved across iterations (no dangling loss)") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"))
      .toDF("x", "y")
    val total = Graph.pagerank(edges, col("x"), col("y"), iters = 5)
      .agg(round(sum("pagerank"), 4)).collect().head.getDouble(0)
    assert(total == 1.0)
  }

  test("textrank: co-occurrence edges come from shared docs, deduped") {
    import spark.implicits._
    // doc1 links a-b, doc2 links b-c; doc3 repeats doc1 (edges dedupe
    // to the same a-b-c path), doc4 is a singleton (no edges, token
    // excluded from the graph)
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "b a a"), (4L, "lonely"))
      .toDF("doc_id", "text")
    val out = Graph.textrank(docs, col("text"), col("doc_id"), iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set("a", "b", "c"))
    assert(out("a") == 0.191667 && out("b") == 0.616667 && out("c") == 0.191667)
  }
}
