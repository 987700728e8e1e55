package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** WordPiece likelihood-ratio merge learning + greedy inference. */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // word freqs: ab ×9, xy ×3, aq ×3 → units a:12 ##b:9 x:3 ##y:3 ##q:3
  private def fixture = {
    import spark.implicits._
    Seq("ab ab ab xy aq", "ab ab ab xy aq", "ab ab ab xy aq").toDF("text")
  }

  test("wpSymbols: first char plain, continuations ##-prefixed") {
    import spark.implicits._
    val out = Seq("abc", "a", "xy").toDF("w")
      .select(WordPiece.wpSymbols(col("w")).as("s"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("a ##b ##c", "a", "x ##y"))
  }

  test("train: ratio score beats raw frequency; ties break on pair text") {
    // round 1 scores: (a,##b) 9/(12·9)=.0833, (x,##y) 3/(3·3)=.3333,
    //   (a,##q) 3/(12·3)=.0833 → (x,##y) wins on RATIO though its
    //   count is 3× smaller (the defining WordPiece behavior; BPE
    //   would pick (a,##b))
    // round 2: (a,##b) .0833 vs (a,##q) .0833 → tie → pair asc
    // round 3: (a,##q) 3/(3·3)=.3333 after a's count shrank to 3
    val rules = WordPiece.train(fixture, col("text"), merges = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(rules.toSeq == Seq(
      (1L, "x", "##y", "xy", 3L),
      (2L, "a", "##b", "ab", 9L),
      (3L, "a", "##q", "aq", 3L)))
    // contrast: BPE on the same corpus merges the count-max pair first
    val bpe = Bpe.train(fixture, col("text"), merges = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).head
    assert(bpe == (("a", "b")))
  }

  test("train: distributed loop ≡ driver loop") {
    val byDriver = WordPiece.train(fixture, col("text"), merges = 3)
      .collect().map(_.toSeq).toSeq
    spark.conf.set(Bpe.LocalVocabThresholdKey, "0")
    try {
      val byCluster = WordPiece.train(fixture, col("text"), merges = 3)
        .collect().map(_.toSeq).toSeq
      assert(byCluster == byDriver)
    } finally spark.conf.unset(Bpe.LocalVocabThresholdKey)
  }

  test("encodeWordLocal: greedy longest-match-first; whole-word [UNK]") {
    val vocab = new java.util.HashSet[java.lang.String](
      java.util.Arrays.asList("a", "x", "##b", "##y", "##q", "ab", "aq", "xy"))
    def enc(w: String) = WordPiece.encodeWordLocal(w, vocab, 2)
    assert(enc("ab") == "ab") // longest wins over "a"+"##b"
    assert(enc("xy") == "xy")
    assert(enc("abq") == "ab ##q")
    assert(enc("aq") == "aq")
    assert(enc("zz") == "[UNK]") // unmatched char fails the WHOLE word
    assert(enc("az") == "[UNK]") // ...even after a matched prefix
  }

  test("encodeWordLocal: 'longest' is measured in code points, not UTF-16 units") {
    // 𝒶 (U+1D4B6) is one code point but TWO UTF-16 chars. A vocab with
    // both the 2-code-point astral token and a 3-code-point BMP token
    // must pick by code-point length — the DuckDB twin ranks candidates
    // by length() (code points), so UTF-16 greed would diverge the gate.
    val astral = new String(Character.toChars(0x1D4B6))
    val vocab = new java.util.HashSet[java.lang.String](java.util.Arrays.asList(
      "abc", "ab", "a", s"$astral$astral", astral,
      "##c", s"##$astral", "##b", "##a"))
    // word = 𝒶𝒶abc: greedy at pos 0 must NOT let the 4-UTF-16-unit
    // astral pair outrank... it is the longest here (2 cps) since "abc"
    // doesn't match at pos 0; then ##a ##b ##c. The real pin: word
    // abc𝒶𝒶 — at pos 0, "abc" (3 cps) must beat nothing shorter, and
    // maxTokenCps=3 must still allow matching the astral pair inside.
    def enc(w: String) = WordPiece.encodeWordLocal(w, vocab, 3)
    assert(enc(s"$astral${astral}abc") == s"$astral$astral ##a ##b ##c")
    // surrogate boundaries are never split mid-pair
    assert(enc(s"abc") == "abc")
    assert(enc(s"a$astral") == s"a ##$astral")
    // a word containing an unmatched astral char fails whole-word
    val other = new String(Character.toChars(0x1D4B7))
    assert(enc(s"a$other") == "[UNK]")
  }

  test("encode: corpus round trip with trained vocab, alphabet fallback") {
    import spark.implicits._
    val docs = Seq((1L, "ab xy aq"), (2L, "abq ab"), (3L, "  "))
      .toDF("doc_id", "text")
    val merged = WordPiece.train(fixture, col("text"), merges = 3)
      .orderBy("step").collect().map(_.getString(3)).toSeq
    val alpha = WordPiece.alphabet(fixture, col("text"))
      .collect().map(_.getString(0)).toSeq
    val byId = WordPiece.encode(docs, col("text"), col("doc_id"),
        (alpha ++ merged).distinct)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    assert(byId(1L) == ((3L, "ab xy aq")))
    assert(byId(2L) == ((3L, "ab ##q ab"))) // greedy: ab + ##q, not a ##b ##q
    assert(byId(3L) == ((0L, ""))) // whitespace-only doc
    assert(byId.size == 3)
  }
}
