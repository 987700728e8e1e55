package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** TF-IDF top-k and the salted capped inverted index: semantics under
  * repeated terms, caps, and multi-bucket salt merges.
  */
class IndexingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("tfidf: ubiquitous terms score zero, rare terms rank first") {
    val d = docs(
      (1L, "the cat sat"),
      (2L, "the dog ran"),
      (3L, "the the zebra"))
    val out = TextStats.tfidfTopK(d, col("text"), col("doc_id"), k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank")) ->
        ((r.getAs[String]("token"), r.getAs[Long]("tf"), r.getAs[Long]("df"),
          r.getAs[Double]("score")))).toMap
    // ln(3/1) = 1.0986; 'the' (df=3) scores 0 everywhere
    assert(out((1L, 1L)) == (("cat", 1L, 1L, 1.0986)))
    assert(out((1L, 2L)) == (("sat", 1L, 1L, 1.0986)))
    // doc 3: tf=2 for 'the' still scores 0; zebra wins
    assert(out((3L, 1L)) == (("zebra", 1L, 1L, 1.0986)))
    assert(out((3L, 2L))._1 == "the")
    assert(out((3L, 2L))._4 == 0.0)
  }

  test("tfidf: k caps per-document output, ties break on token text") {
    val d = docs((1L, "b a c"), (2L, "x"))
    val out = TextStats.tfidfTopK(d, col("text"), col("doc_id"), k = 2)
      .where(col("doc_id") === 1L).orderBy("rank")
      .collect().map(_.getAs[String]("token")).toSeq
    assert(out == Seq("a", "b"))
  }

  test("bpe pairs: adjacent-char counts weighted by word frequency") {
    import spark.implicits._
    // 'ab' ×3 (two docs), 'abc' ×1, single chars dropped
    val d = docs((1L, "ab ab x"), (2L, "ab abc"))
    val out = TextStats.bpePairs(d, col("text"), topK = 10)
      .collect().map(r => r.getAs[String]("pair") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("rank")))).toMap
    // 'a b' from every ab (3) + abc (1) = 4; 'b c' from abc = 1
    assert(out == Map("a b" -> ((4L, 1L)), "b c" -> ((1L, 2L))))
  }

  test("inverted index: df counts documents once, postings capped at the lowest ids") {
    // 'w' in 5 docs (repeated within doc 10 — df counts it once);
    // cap=3 keeps the three lowest doc ids across salt buckets
    val d = docs(
      (10L, "w w alpha"), (11L, "w"), (12L, "w"), (13L, "w"), (14L, "w beta"))
    val out = TextStats.invertedIndex(d, col("text"), col("doc_id"),
        cap = 3, salts = 2)
      .collect().map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("df"), r.getSeq[Long](r.fieldIndex("postings")).toList))).toMap
    assert(out("w") == ((5L, List(10L, 11L, 12L))))
    assert(out("alpha") == ((1L, List(10L))))
    assert(out("beta") == ((1L, List(14L))))
  }

  test("inverted index: salt-bucket merge is exact even when one bucket dominates") {
    // even ids land in one salt bucket with salts=2; cap=2 must still
    // pick the global lowest two ids, not two per bucket
    val d = docs((2L, "t"), (4L, "t"), (6L, "t"), (3L, "t"))
    val out = TextStats.invertedIndex(d, col("text"), col("doc_id"),
        cap = 2, salts = 2)
      .collect().map(r => r.getAs[String]("token") ->
        r.getSeq[Long](r.fieldIndex("postings")).toList).toMap
    assert(out("t") == List(2L, 3L))
  }
}
