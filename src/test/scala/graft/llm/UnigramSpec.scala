package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Unigram-LM (SentencePiece-style Viterbi-EM) tokenizer training. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def mkLogp(ps: (String, Double)*): java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    ps.foreach { case (p, l) => m.put(p, java.lang.Double.valueOf(l)) }
    m
  }

  test("seedPieces counts every substring ≤ maxPieceLen, freq-weighted") {
    import spark.implicits._
    val docs = Seq("ab ab", "abc").toDF("text")
    val rows = Unigram.seedPieces(docs, col("text"), maxPieceLen = 2, topK = 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // brute force: ab ×2 → subs a,b,ab each ×2; abc ×1 → a,b,c,ab,bc
    assert(rows == Map("a" -> 3L, "b" -> 3L, "ab" -> 3L, "c" -> 1L, "bc" -> 1L))
  }

  test("viterbi returns the max-score segmentation (checked vs full enumeration)") {
    // enumerate every segmentation of each word and assert no
    // alternative scores strictly higher than the DP's choice —
    // independent of the DP's tie-break rules
    val logp = mkLogp("a" -> -2.0, "b" -> -2.1, "ab" -> -1.5, "ba" -> -1.4,
      "aba" -> -3.9, "bab" -> -3.0, "c" -> -5.0, "abc" -> -4.0)
    def segs(w: String, maxLen: Int): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(maxLen, w.length)).flatMap { l =>
        val h = w.substring(0, l)
        if (logp.containsKey(h)) segs(w.substring(l), maxLen).map(h +: _) else Seq.empty
      }
    def score(s: Seq[String]): Double = s.foldLeft(0.0)((a, p) => a + logp.get(p))
    for (w <- Seq("ababab", "abcba", "aaaa", "abba", "babab")) {
      val got = Unigram.viterbi(w, logp, 3).toSeq
      assert(got.mkString == w, s"concat must rebuild '$w'")
      val alts = segs(w, 3)
      assert(alts.nonEmpty)
      val bestAlt = alts.map(score).max
      assert(score(got) >= bestAlt - 1e-12, s"dp segmentation of '$w' suboptimal")
    }
  }

  test("viterbi ties prefer fewer pieces; OOV chars become UNK pieces") {
    // "ab" as one piece vs "a"+"b": equal score -3.0 → fewer pieces wins
    val logp = mkLogp("a" -> -1.5, "b" -> -1.5, "ab" -> -3.0)
    assert(Unigram.viterbi("ab", logp, 2).toSeq == Seq("ab"))
    // 'x' is absent entirely — must still segment, as a lone UNK char
    assert(Unigram.viterbi("axb", logp, 2).toSeq == Seq("a", "x", "b"))
  }

  test("viterbi never splits an astral char into lone surrogates") {
    val emoji = "😀" // U+1F600, 2 UTF-16 units
    // absent from the table → one UNK piece covering the whole pair
    val logp = mkLogp("a" -> -1.0)
    val got = Unigram.viterbi("a" + emoji + "a", logp, 3)
    assert(got.toSeq == Seq("a", emoji, "a"))
    // present in the table → picked as a piece like any other
    val logp2 = mkLogp("a" -> -1.0, emoji -> -0.5, (emoji + "a") -> -0.4)
    assert(Unigram.viterbi("a" + emoji + "a", logp2, 3).toSeq ==
      Seq("a", emoji + "a"))
  }

  test("train: hand-computed fixture (vocab, counts, smoothed logprobs)") {
    import spark.implicits._
    // words: ab ×3, c ×1. Seed: a,b,ab ×3; c ×1. "ab" beats "a b"
    // (ln(3/13) > 2·ln(4/13)), so every round counts ab:3, c:1;
    // chars a,b stay at 0 via add-one smoothing. Final eff totals:
    // ab 3, c 1+1, a 0+1, b 0+1 → 7.
    val docs = Seq("ab ab", "ab c").toDF("text")
    val out = Unigram.train(docs, col("text"), vocabSize = 4,
        seedSize = 10, emIters = 2, maxPieceLen = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    def lp(eff: Long) =
      Unigram.quantizeLogp(math.log(eff.toDouble) - math.log(7.0))
    assert(out.toSeq == Seq(
      (1L, "ab", 3L, lp(3)),
      (2L, "c", 1L, lp(2)),
      (3L, "a", 0L, lp(1)),
      (4L, "b", 0L, lp(1))))
  }

  test("train: vocabSize prunes multi-char pieces but never characters") {
    import spark.implicits._
    val docs = Seq("abcd abcd cd cd cd").toDF("text")
    val out = Unigram.train(docs, col("text"), vocabSize = 5,
        seedSize = 20, emIters = 2, maxPieceLen = 4)
      .collect().map(r => r.getString(1))
    assert(Set("a", "b", "c", "d").subsetOf(out.toSet))
    assert(out.length == 5)
  }

  test("pruneBy=loss keeps the piece with no alternative over the higher-count one") {
    import spark.implicits._
    // ab ×20 with a,b also standalone ×40 each (cheap alternative);
    // cd ×15 with c,d never standalone (alternative = two smoothed
    // zero-count chars). Count ranking prefers ab (20 > 15); loss
    // ranking prefers cd: loss(cd) = 15·ln(15·T) ≈ 112 vs
    // loss(ab) = 20·ln(20·T/41²) ≈ 7 — the two criteria diverge
    // exactly when a frequent piece re-segments cheaply.
    val text = (Seq.fill(20)("ab") ++ Seq.fill(40)("a") ++
      Seq.fill(40)("b") ++ Seq.fill(15)("cd")).mkString(" ")
    val docs = Seq(text).toDF("text")
    def pieces(by: String) = Unigram.train(docs, col("text"), vocabSize = 5,
        seedSize = 10, emIters = 2, maxPieceLen = 2, pruneBy = by)
      .collect().map(_.getString(1)).toSet
    assert(pieces("count") == Set("a", "b", "c", "d", "ab"))
    assert(pieces("loss") == Set("a", "b", "c", "d", "cd"))
  }

  test("driver and distributed paths produce identical tables") {
    import spark.implicits._
    val docs = Seq("the cat sat", "the cat", "the hat sat on the mat",
      "a cat and a hat").toDF("text")
    def run() = Unigram.train(docs, col("text"), vocabSize = 12,
        seedSize = 30, emIters = 2, maxPieceLen = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    val driver = run()
    spark.conf.set(Unigram.LocalVocabThresholdKey, "0")
    try {
      val dist = run()
      assert(dist == driver)
    } finally spark.conf.unset(Unigram.LocalVocabThresholdKey)
  }

  test("encode: piece concatenation rebuilds each word; counts match") {
    import spark.implicits._
    val docs = Seq((1L, "abab cab"), (2L, "  b a  "), (3L, null: String))
      .toDF("doc_id", "text")
    val pieces = Seq("a" -> -2.0, "b" -> -2.0, "ab" -> -1.0, "c" -> -3.0)
    val out = Unigram.encode(docs, col("text"), col("doc_id"), pieces, maxPieceLen = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getString(2)))
    // abab → ab ab; cab → c ab; b a → b a
    assert(out.toSeq == Seq(
      (1L, 4L, "ab ab c ab"),
      (2L, 2L, "b a"),
      (3L, -1L, null)))
  }
}
