package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Randomized triangulation of the shared text kernels against
  * [[PlainTextRef]], the third (plain-Scala, engine-free)
  * implementation — closing the common-mode channel between the
  * Catalyst kernels and the builder-written DuckDB twins (round 11
  * caught two `\n`-phantom-token near-misses exactly because both
  * sides shared an assumption). ≥ 500 random cases per kernel over an
  * alphabet that deliberately includes exotic ASCII whitespace
  * (\x0B, \f, \r), Unicode whitespace LOOKALIKES that must NOT split
  * (U+00A0, U+2003, U+3000, U+2028), combining accents, and
  * astral-plane letters (case-folding surrogate pairs).
  *
  * Deliberately excluded from the alphabet: the handful of code
  * points where Unicode FULL case mapping differs from per-code-point
  * simple mapping (U+0130 İ → "i"+combining dot, Σ's word-final ς
  * contextual form). Engines use full mapping, PlainTextRef uses
  * simple; none of the corpus operators depend on those characters,
  * and the divergence class is documented here rather than silently
  * averaged over.
  */
class PlainTextRefPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val deseretCap = new String(Character.toChars(0x10400)) // 𐐀
  private val deseretLow = new String(Character.toChars(0x10428))
  private val script = new String(Character.toChars(0x1D4B6))     // 𝒶

  private val atoms: Vector[String] = Vector(
    "a", "b", "Z", "Q", "7", "word", "x",
    " ", " ", "\t", "\n", "\u000B", "\f", "\r", "\r\n",
    "\u00A0", "\u2003", "\u3000", "\u2028", // NOT separators
    "é", "Ü", "ß", "ñ", "ç",
    deseretCap, deseretLow, script,
    "", "  ", "\t ")

  private def gen(rnd: scala.util.Random): String = {
    val n = rnd.nextInt(12)
    (0 until n).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
  }

  /** Fixed seed: failures must reproduce. */
  private def cases(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq("", " ", "\t", " ", "a b", s"$deseretCap x", "ab") ++
      (0 until n).map(_ => gen(rnd))
  }

  test("shingle kernel == PlainTextRef.shingles on 600 random exotic texts") {
    import spark.implicits._
    val texts = cases(seed = 0xC0FFEE, n = 600)
    val df = texts.toDF("text")
    for (w <- Seq(1, 2, 3)) {
      val got = df.select(graft.llm.Dedup.shingles(col("text"), w))
        .collect().map(_.getSeq[String](0).toVector)
      texts.lazyZip(got).foreach { (t, g) =>
        assert(g == PlainTextRef.shingles(t, w),
          s"w=$w text=${t.map(c => f"\\u${c.toInt}%04X").mkString}")
      }
    }
  }

  test("positional kernel ∘ split(trim) == PlainTextRef words+positional (500+)") {
    import spark.implicits._
    val texts = cases(seed = 0xBEEF, n = 550)
    val df = texts.toDF("text")
    for (w <- Seq(1, 2)) {
      val got = df
        .select(TextKernels.positionalShingles(
          split(trim(col("text")), "\\s+"), w))
        .collect().map(_.getSeq[String](0).toVector)
      texts.lazyZip(got).foreach { (t, g) =>
        assert(g == PlainTextRef.positionalShingles(PlainTextRef.words(t), w),
          s"w=$w text=${t.map(c => f"\\u${c.toInt}%04X").mkString}")
      }
    }
  }

  test("normalizedText == PlainTextRef.normalizedText on 600 random exotic texts") {
    import spark.implicits._
    val texts = cases(seed = 0xDECAF, n = 600)
    val got = texts.toDF("text")
      .select(graft.llm.Dedup.normalizedText(col("text")))
      .collect().map(_.getString(0))
    texts.lazyZip(got).foreach { (t, g) =>
      assert(g == PlainTextRef.normalizedText(t),
        s"text=${t.map(c => f"\\u${c.toInt}%04X").mkString}")
    }
  }

  test("trainer pretokenization (split+filter) == PlainTextRef.tokens (500+)") {
    import spark.implicits._
    val texts = cases(seed = 0xFACADE, n = 550)
    val ws = split(trim(col("text")), "\\s+")
    val got = texts.toDF("text")
      .select(filter(ws, t => t =!= ""))
      .collect().map(_.getSeq[String](0).toVector)
    texts.lazyZip(got).foreach { (t, g) =>
      assert(g == PlainTextRef.tokens(t),
        s"text=${t.map(c => f"\\u${c.toInt}%04X").mkString}")
    }
  }

  test("null text: kernels stay null, plain ref never sees it (schema contract)") {
    import spark.implicits._
    val df = Seq(Some("a b"), None).toDF("text")
    val r = df.select(
      graft.llm.Dedup.shingles(col("text"), 2).as("sh"),
      graft.llm.Dedup.normalizedText(col("text")).as("n")).collect()
    assert(r.count(_.isNullAt(0)) == 1 && r.count(_.isNullAt(1)) == 1)
  }
}
