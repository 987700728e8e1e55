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

  test("c4 signals: line ratios, document drops, keep decision") {
    import spark.implicits._
    val doc =
      "This is a proper sentence.\n" +
      "- a bullet item\n" +
      "trailing off somewhere...\n" +
      "short\n" +
      "Another full sentence with enough words here."
    def sig(text: String): Map[String, Any] = {
      val row = Seq(text).toDF("text")
        .select(TextStats.c4Signals(col("text")): _*).head()
      row.schema.fieldNames.zip(row.toSeq).toMap
    }
    val s = sig(doc)
    assert(s("n_lines") == 5L)
    assert(s("term_punct_ratio") == 0.6)  // lines 1, 3 (…), 5 end in .
    assert(s("bullet_ratio") == 0.2)
    assert(s("ellipsis_ratio") == 0.2)
    assert(s("long_line_ratio") == 0.4)   // >= 5 words: lines 1 and 5
    assert(s("has_lorem") == 0L && s("has_brace") == 0L)
    assert(sig("Some Lorem Ipsum boilerplate.")("has_lorem") == 1L)
    assert(sig("if (x) { return y }")("has_brace") == 1L)

    def keep(text: String): Boolean = Seq(text).toDF("text")
      .select(TextStats.c4Keep(col("text")).as("k")).head().getBoolean(0)
    // enough words, every line punctuated → kept
    assert(keep("One full sentence with plenty of words right here today.\n" +
      "And another complete sentence to round the document out."))
    assert(!keep("lorem ipsum " + ("word " * 20) + "Ends fine."))
    assert(!keep(("word " * 20) + "{ code }.")) // brace drop
    assert(!keep("No terminal punctuation " + ("word " * 20))) // punct floor
    assert(!keep("Too short."))                 // word-count floor
  }

  test("gopher rules: each threshold drops its own degenerate doc") {
    import spark.implicits._
    def keep(t: String): Boolean = Seq(t).toDF("text")
      .select(TextStats.gopherKeep(col("text")).as("k"))
      .collect().head.getBoolean(0)
    val good = ("the be to of " + ("plain word " * 30)).trim
    assert(keep(good))
    assert(!keep("the be too short"))                       // < 50 words
    assert(!keep(("the be " + ("# " * 60)).trim))           // symbols + word len
    // 3 long lines, each ellipsis-terminated: line fraction 1.0 trips
    // while the symbol ratio (3/60) stays under its own threshold
    assert(!keep(Seq.fill(3)("the be to of " + ("word " * 16).trim + "…")
      .mkString("\n")))
    val bullets = ("the be to of " + ("word " * 50)).trim
      .split(" ").map("- " + _).mkString("\n")
    assert(!keep(bullets))                                  // all bullet lines
    assert(!keep(("the be " + ("1234 " * 60)).trim))        // numeric words
    assert(!keep(("plain " * 60).trim))                     // no required stopwords
  }

  test("unigramLogLoss: corpus-as-LM mean NLL and perplexity per doc") {
    import spark.implicits._
    // corpus: a×6 b×1 c×1, total 8 → P(a)=3/4, P(b)=P(c)=1/8
    val docs = Seq((1L, "a a b c"), (2L, "a a a a")).toDF("doc_id", "text")
    val out = TextStats.unigramLogLoss(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    def r4(x: Double) = math.round(x * 1e4) / 1e4
    val nll1 = (2 * -math.log(0.75) + 2 * -math.log(0.125)) / 4
    assert(out(1L) == ((4L, r4(nll1), r4(math.exp(nll1)))))
    val nll2 = -math.log(0.75)
    assert(out(2L) == ((4L, r4(nll2), r4(math.exp(nll2)))))
    // boilerplate (all-common tokens) scores strictly lower
    assert(out(2L)._2 < out(1L)._2)
  }

  test("bigramLogLoss: seen bigrams use the LM, unseen take Stupid Backoff") {
    import spark.implicits._
    // train: "a b a b" → bigrams (a,b)×2 (b,a)×1; uni a:2 b:2;
    // total 4, |V| 2
    val train = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val docs = Seq((0L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextStats.bigramLogLoss(train, docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    def r4(x: Double) = math.round(x * 1e4) / 1e4
    // train doc: p(b|a)=1, p(a|b)=1/2, p(b|a)=1 → nll = ln2/3
    val nll0 = math.log(2.0) / 3
    assert(out(0L) == ((3L, r4(nll0), r4(math.exp(nll0)))))
    // held-out doc: (a,b) seen p=1; (b,c) unseen → 0.4·(0+1)/(4+2)
    val nll2 = (0.0 - math.log(0.4 / 6.0)) / 2
    assert(out(2L) == ((2L, r4(nll2), r4(math.exp(nll2)))))
    // single-token docs drop
    assert(!TextStats.bigramLogLoss(train,
        Seq((9L, "solo")).toDF("doc_id", "text"), col("text"), col("doc_id"))
      .collect().map(_.getLong(0)).contains(9L))
  }

  test("bigramKnLogLoss: discounted+interpolated seen mass, continuation backoff") {
    import spark.implicits._
    // train "a b a b a c": bigrams (a,b)x2 (b,a)x2 (a,c)x1
    //   n1=1, n2=2 -> D = 1/5; btypes=3, |V|=3
    //   ctx: a -> n_ctx 3, types_after 2; b -> n_ctx 2, types_after 1
    //   cont: b -> 1, a -> 1, c -> 1
    val train = Seq((0L, "a b a b a c")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b"), (2L, "a z"), (3L, "z a")).toDF("doc_id", "text")
    val out = TextStats.bigramKnLogLoss(train, docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    def r4(x: Double) = math.round(x * 1e4) / 1e4
    val d = 1.0 / 5.0
    def pcont(nCont: Long) = (nCont + 1).toDouble / (3 + 3 + 1)
    // seen (a,b): (2-D)/3 + (D*2/3)*pcont(b)
    val pAB = (2.0 - d) / 3 + ((d * 2) / 3) * pcont(1)
    assert(out(1L) == ((1L, r4(-math.log(pAB)), r4(math.exp(-math.log(pAB))))))
    // seen context, unseen continuation (a,z): 0/3 + (D*2/3)*pcont(0)
    val pAZ = ((d * 2) / 3) * pcont(0)
    assert(out(2L)._2 == r4(-math.log(pAZ)))
    // unseen context (z,a): pure continuation prob
    assert(out(3L)._2 == r4(-math.log(pcont(1))))
    // the discounted seen estimate must dominate the backoff ones
    assert(out(1L)._2 < out(2L)._2 && out(1L)._2 < out(3L)._2)
  }

  test("vocabReport ranks by frequency with exact cumulative coverage") {
    import spark.implicits._
    // stream: a×5 b×3 c×1 d×1 → total 10
    val docs = Seq((1L, "a b a b a"), (2L, "a b c a d")).toDF("doc_id", "text")
    val out = TextStats.vocabReport(docs, col("text"), topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._3)
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("a", 5L, 1L), ("b", 3L, 2L), ("c", 1L, 3L))) // c beats d on text
    assert(out.map(_._4).toSeq == Seq(0.5, 0.3, 0.1))
    assert(out.map(_._5).toSeq == Seq(0.5, 0.8, 0.9))
  }
}
