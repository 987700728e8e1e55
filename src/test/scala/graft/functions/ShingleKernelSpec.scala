package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The native shingle kernel must be bit-identical to the HOF chain
  * it replaced — including the degenerate shapes (short docs, messy
  * whitespace, repeated shingles, distinct order).
  */
class ShingleKernelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** The original Column composition, kept as the reference. */
  private def hofShingles(text: org.apache.spark.sql.Column, w: Int) = {
    val words = split(trim(text), "\\s+")
    val n = size(words) - (w - 1)
    array_distinct(
      filter(
        when(n >= 1,
          transform(sequence(lit(1), greatest(n, lit(1))),
            i => array_join(slice(words, i, lit(w)), " ")))
          .otherwise(array().cast("array<string>")),
        s => s =!= ""))
  }

  test("kernel == HOF chain on every shape, element order included") {
    import spark.implicits._
    val texts = Seq(
      "a b c d e f g",
      "a b c d e a b c d e a b c d e", // repeats → distinct collapses
      "  padded   doc  with   runs  ",
      "short",
      "", "   ",
      "x y z w v",                      // exactly w words (w = 5)
      "tabs\tand\nnewlines mixed in here too"
    ).toDF("text")
    for (w <- Seq(1, 2, 3, 5)) {
      val rows = texts.select(
        graft.llm.Dedup.shingles(col("text"), w).as("native"),
        hofShingles(col("text"), w).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"w=$w diverged: native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
      }
    }
  }

  test("positional kernel == positional HOF chain (order, duplicates kept)") {
    import spark.implicits._
    def hofPositional(words: org.apache.spark.sql.Column, w: Int) = {
      val n = size(words) - (w - 1)
      when(n >= 1,
        transform(sequence(lit(1), greatest(n, lit(1))),
          i => array_join(slice(words, i, lit(w)), " ")))
        .otherwise(array().cast("array<string>"))
    }
    val texts = Seq("a b a b a b", "x", "", "p q r s t u v").toDF("text")
    for (w <- Seq(1, 2, 5)) {
      val rows = texts.select(split(trim(col("text")), "\\s+").as("ws"))
        .select(
          TextKernels.positionalShingles(col("ws"), w).as("native"),
          hofPositional(col("ws"), w).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"w=$w diverged: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }

  test("null text stays null; kernel runs inside codegen") {
    val df = spark.range(5).select(
      when(col("id") % 2 === 0, concat(lit("w"), col("id"), lit(" x y z v")))
        .as("text"))
    val out = df.select(graft.llm.Dedup.shingles(col("text"), 5).as("sh"))
    val rows = out.collect()
    assert(rows.count(_.isNullAt(0)) == 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("Project") && l.contains("*(")),
      s"kernel fell out of codegen:\n$plan")
  }
}
