package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Distributed logistic-regression training (full-batch GD). */
class QualityTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("one GD step matches the hand-computed mean gradient") {
    import spark.implicits._
    // two docs: y=1 "aa bb" (x1=2/64, x2=1, x3=0), y=0 "zz13!" →
    // x1=1/64, x2=2/5 (2 alpha? 'zz13!' alpha chars = z,z → 2/5), x3=0.
    val docs = Seq(("aa bb", "en"), ("zz13!", "fr")).toDF("text", "lang")
    val out = TextStats.trainQualityClassifier(
        docs, col("text"), (col("lang") === "en").cast("int"),
        iters = 1, lr = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // σ(0)=0.5 → residuals d = (0.5−1, 0.5−0) = (−0.5, +0.5)
    // gb = 0; g_len = (−0.5·2/64 + 0.5·1/64)/2 = −1/256
    // g_alpha = (−0.5·1 + 0.5·0.4)/2 = −0.15; g_stop = 0
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out.toSeq == Seq((1L, 0.0, r6(1.0 / 256), 0.15, 0.0)))
  }

  test("weights move toward separating the labels over iterations") {
    import spark.implicits._
    // y=1 docs are all-alphabetic, y=0 docs are digit-heavy — the
    // alpha-ratio weight must grow positive and the loss must fall
    val docs = (1 to 40).map(i =>
      if (i % 2 == 0) ("clean alpha words here", "en")
      else ("1234 5678 90!! ####", "xx")).toDF("text", "lang")
    val trace = TextStats.trainQualityClassifier(
        docs, col("text"), (col("lang") === "en").cast("int"),
        iters = 8, lr = 2.0)
      .orderBy("iter").collect()
    val wAlphaFirst = trace.head.getDouble(3)
    val wAlphaLast = trace.last.getDouble(3)
    assert(wAlphaLast > wAlphaFirst && wAlphaLast > 0.0,
      s"alpha weight should grow positive: $wAlphaFirst -> $wAlphaLast")
  }
}
