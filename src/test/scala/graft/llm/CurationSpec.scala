package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Decontamination and PII scrubbing semantics on constructed docs. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("contaminated: shared-shingle threshold against a broadcast eval set") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),  // contains the eval 5-gram twice-shifted
      (2L, "alpha beta gamma delta epsilon"),       // the eval doc verbatim
      (3L, "totally different words here entirely none"),
      (4L, "alpha beta gamma something else other")) // shares < 2 shingles
      .toDF("doc_id", "text")
    val eval = Seq("alpha beta gamma delta epsilon").toDF("text")
    val got = Decontaminate.contaminated(
      docs, eval, col("text"), col("doc_id"), col("text"), w = 5, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // every doc shares at most ONE distinct 5-shingle with the eval
    // text, so the minShared=2 threshold admits nothing...
    assert(got.isEmpty)
    val loose = Decontaminate.contaminated(
      docs, eval, col("text"), col("doc_id"), col("text"), w = 5, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(loose == Map(1L -> 1L, 2L -> 1L))
    val clean = Decontaminate.clean(
      docs, eval, col("text"), col("doc_id"), col("text"), w = 5, minShared = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(3L, 4L))
  }

  test("scrubPii redacts emails, IPs, and phones; counts match") {
    import spark.implicits._
    val r = Seq("mail a.b+c@test.org or 192.168.0.1 or +44 20 7946 0958 end")
      .toDF("text")
      .select(TextStats.scrubPii(col("text")).as("s") +: TextStats.piiCounts(col("text")): _*)
      .head()
    assert(r.getString(0) == "mail <EMAIL> or <IP> or <PHONE> end")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 1L)))
  }

  test("scrub is the identity on clean text") {
    import spark.implicits._
    val s = Seq("no personal data in this sentence at all")
      .toDF("text").select(TextStats.scrubPii(col("text"))).head().getString(0)
    assert(s == "no personal data in this sentence at all")
  }
}
