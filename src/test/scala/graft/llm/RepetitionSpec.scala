package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Gopher-style within-document repetition metrics — exercised with
  * constructed multi-line documents, because the synthetic corpus is
  * single-line (there the oracle checks only engine equality).
  */
class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def metrics(text: String): (Double, Double, Double, Double) = {
    import spark.implicits._
    val r = Seq(text).toDF("text").select(
      TextStats.dupLineRatio(col("text")),
      TextStats.dupLineCharRatio(col("text")),
      TextStats.topBigramCharRatio(col("text")),
      TextStats.dupTrigramRatio(col("text"))).head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  private def near(x: Double, y: Double): Boolean = math.abs(x - y) <= 1e-6

  test("duplicate lines: ratio counts repeats, char ratio weights by length") {
    // non-empty trimmed lines: spam, ham, spam, ok (blank lines drop);
    // "spam" repeats -> 8 of 13 line chars are duplicated
    val (lr, lcr, _, _) = metrics("spam\nham\nspam\n\n  \nok")
    assert(lr == 0.25) // 1 - 3 distinct / 4 lines
    assert(near(lcr, 8.0 / 13.0))
  }

  test("unique text scores zero on line/trigram axes; bigram ties break low") {
    val (lr, lcr, tbr, tgr) = metrics("alpha beta\ngamma delta")
    assert(lr == 0.0 && lcr == 0.0 && tgr == 0.0)
    // all bigrams occur once -> lexicographically smallest ("alpha
    // beta", 9 chars) over 19 word chars
    assert(near(tbr, math.rint(9.0 / 19.0 * 1e6) / 1e6))
  }

  test("top bigram coverage: repeated bigram dominates") {
    // "a b" x3 of 5 bigrams over 6 single-char words
    val (_, _, tbr, tgr) = metrics("a b a b a b")
    assert(tbr == 1.0) // 3 occurrences x 2 chars / 6 word chars
    // trigrams [a b a, b a b, a b a, b a b]: 2 distinct of 4
    assert(tgr == 0.5)
  }

  test("native kernel is bit-identical to the four Column chains") {
    import spark.implicits._
    val texts = Seq(
      "spam\nham\nspam\n\n  \nok",
      "alpha beta\ngamma delta",
      "a b a b a b",
      "", "word", "two words",
      "x y x y z x y\nx y x y z x y\nother line",
      "tabs\tand spaces  mixed\nsecond  line\nsecond  line",
      "p q r p q r p q r p q",
      "é ü é ü é"  // non-ASCII code points count once
    ).toDF("text")
    val rows = texts.select(
      TextStats.repetitionMetrics(col("text")).as("m"),
      TextStats.dupLineRatio(col("text")).as("r1"),
      TextStats.dupLineCharRatio(col("text")).as("r2"),
      TextStats.topBigramCharRatio(col("text")).as("r3"),
      TextStats.dupTrigramRatio(col("text")).as("r4"))
      .collect()
    rows.foreach { r =>
      val m = r.getStruct(0)
      assert(m.getDouble(0) == r.getDouble(1), s"dup_line_ratio: $r")
      assert(m.getDouble(1) == r.getDouble(2), s"dup_line_char_ratio: $r")
      assert(m.getDouble(2) == r.getDouble(3), s"top_bigram_char_ratio: $r")
      assert(m.getDouble(3) == r.getDouble(4), s"dup_trigram_ratio: $r")
    }
  }

  test("degenerate inputs: empty, single word, two words") {
    assert(metrics("") == ((0.0, 0.0, 0.0, 0.0)))
    assert(metrics("word") == ((0.0, 0.0, 0.0, 0.0)))
    val (_, _, tbr, tgr) = metrics("two words")
    assert(tbr == 1.0 && tgr == 0.0) // the one bigram covers all chars
  }
}
