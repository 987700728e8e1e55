package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Per-group duplication audit: exact distinct/total shingle counts
  * via two-phase hash aggregation — and the plan never windows or
  * count(DISTINCT)-expands the content key.
  */
class DuplicationStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("dup_ratio separates a boilerplate-heavy group from an all-unique one") {
    import spark.implicits._
    // 'dup': 4 docs sharing one 5-word text → 4 occurrences of 1
    // distinct shingle → ratio 0.75. 'uniq': 3 docs, disjoint
    // shingles → ratio 0. 'short': below shingle width → no shingles.
    val docs = (
      (0 until 4).map(i => (i.toLong, "alpha bravo charlie delta echo", "dup")) ++
      (4 until 7).map(i => (i.toLong,
        s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f", "uniq")) ++
      Seq((7L, "too short", "short"))
    ).toDF("doc_id", "text", "source")

    val out = Dedup.duplicationStats(docs, col("text"), "source")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "window over the content key")
    assert(!plan.toLowerCase.contains("expand"),
      "count(DISTINCT) expand over the shingle grain")

    val byGrp = out.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(byGrp("dup") == ((4L, 4L, 1L, Some(0.75))))
    // 6 words → 2 shingles per doc, all distinct across docs
    assert(byGrp("uniq") == ((3L, 6L, 6L, Some(0.0))))
    assert(byGrp("short") == ((1L, 0L, 0L, None)))
  }
}
