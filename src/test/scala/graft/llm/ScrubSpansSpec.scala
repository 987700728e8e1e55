package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** ExactSubstr-removal semantics for [[Dedup.scrubSpans]]: a word
  * survives iff no corpus-repeated w-shingle covers it, coverage
  * chains across overlapping duplicate shingles, intra-document
  * repeats count, and the plan never windows over the content hash.
  */
class ScrubSpansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(w: Int, docs: (Long, String)*): Map[Long, (String, Long, Long)] = {
    import spark.implicits._
    Dedup.scrubSpans(docs.toDF("doc_id", "text"), col("text"), col("doc_id"), w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("cross-document repeated span is cut from both documents") {
    // "one two three" repeats verbatim in docs 1 and 2 (w=3): all
    // three covered words vanish on both sides; unique words survive.
    val out = run(3,
      1L -> "a b one two three c d",
      2L -> "x one two three y z q")
    assert(out(1L) == (("a b c d", 7L, 3L)))
    assert(out(2L) == (("x y z q", 7L, 3L)))
  }

  test("overlapping duplicate shingles chain their coverage") {
    // docs share the 4-word phrase -> two overlapping dup 3-shingles
    // in each doc; coverage is the union, not just one window.
    val out = run(3,
      1L -> "p q one two three four r",
      2L -> "one two three four s t u")
    assert(out(1L) == (("p q r", 7L, 4L)))
    assert(out(2L) == (("s t u", 7L, 4L)))
  }

  test("intra-document repetition counts as duplication") {
    val out = run(2, 1L -> "go go go stop", 2L -> "calm words only here")
    // "go go" occurs at starts 0 and 1 -> duplicated; covers words
    // 0..2; "go stop" and the doc-2 shingles are unique.
    assert(out(1L) == (("stop", 4L, 3L)))
    assert(out(2L) == (("calm words only here", 4L, 0L)))
  }

  test("documents shorter than w pass through untouched") {
    val out = run(5, 1L -> "tiny doc", 2L -> "tiny doc")
    assert(out(1L) == (("tiny doc", 2L, 0L)))
    assert(out(2L) == (("tiny doc", 2L, 0L)))
  }

  test("a fully-duplicated document scrubs to empty text") {
    val out = run(3, 1L -> "same words here", 2L -> "same words here")
    assert(out(1L) == (("", 3L, 3L)))
    assert(out(2L) == (("", 3L, 3L)))
  }

  test("plan: hash aggregates only, no window over the shingle hash") {
    import spark.implicits._
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", lit("shared boiler plate prefix words"),
        concat(lit("u"), col("id"))).as("text"))
    val out = Dedup.scrubSpans(docs, col("text"), col("doc_id"), w = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "window over content-hash key")
    assert(plan.contains("HashAggregate"))
    // every doc shares the 5-word boilerplate shingle -> those 5
    // words vanish everywhere, the unique suffix survives
    val rows = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(7L) == "u7" && rows(199L) == "u199")
  }
}
