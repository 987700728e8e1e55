package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Distributed BPE merge learning + encoding. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("train: learns the classic low/lower merges in frequency order") {
    import spark.implicits._
    // word freqs: low ×3, lower ×2 → pair counts round 1:
    //   "l o" 5, "o w" 5, "w e" 2, "e r" 2 → tie (5) breaks on pair
    //   text asc → "l o" wins
    val docs = Seq("low low lower", "low lower").toDF("text")
    val rules = Bpe.train(docs, col("text"), merges = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // round 2: syms low→"lo w", lower→"lo w e r":
    //   "lo w" 5, "w e" 2, "e r" 2 → "lo w" wins (5)
    // round 3: low→"low", lower→"low e r": "low e" 2, "e r" 2 →
    //   tie breaks text asc → "e r"
    assert(rules.toSeq == Seq(
      (1L, "l", "o", "lo", 5L),
      (2L, "lo", "w", "low", 5L),
      (3L, "e", "r", "er", 2L)))
  }

  test("applyMerge uses left-to-right non-overlapping replace-scan passes") {
    import spark.implicits._
    val out = Seq("a a a", "a a a a", "b a a b", "x")
      .toDF("s")
      .select(Bpe.applyMerge(col("s"), lit("a"), lit("a")).as("m"))
      .collect().map(_.getString(0))
    // "a a a"   → first pair merges, lone a remains → "aa a"
    // "a a a a" → pass semantics: scan merges (1,2) then (3,4) across
    //             passes → "aa aa"
    // "b a a b" → inner pair merges → "b aa b"
    assert(out.toSeq == Seq("aa a", "aa aa", "b aa b", "x"))
  }

  test("encode applies learned rules in order; token counts drop") {
    import spark.implicits._
    val docs = Seq((1L, "low lower"), (2L, "wow")).toDF("doc_id", "text")
    val out = Bpe.encode(docs, col("text"), col("doc_id"),
        Seq(("l", "o"), ("lo", "w")))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // low → "low"; lower → "low e r"; wow untouched by rule 1, rule 2
    // needs "lo w" which wow lacks ("w o w")
    assert(out.toSeq == Seq(
      (1L, 4L, "low low e r"),
      (2L, 3L, "w o w")))
  }

  test("train: driver-side classic loop ≡ distributed merge loop") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val letters = "abcde"
    val docs = (1 to 60).map { _ =>
      (1 to 8).map(_ =>
        (1 to (2 + rnd.nextInt(5))).map(_ =>
          letters(rnd.nextInt(letters.length))).mkString).mkString(" ")
    }.toDF("text")
    def run(): Seq[(Long, String, String, String, Long)] =
      Bpe.train(docs, col("text"), merges = 5).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
    val local = run()
    spark.conf.set(Bpe.LocalVocabThresholdKey, "0") // force distributed
    val dist =
      try run()
      finally spark.conf.unset(Bpe.LocalVocabThresholdKey)
    assert(local == dist)
    assert(local.size == 5)
  }

  test("selectMergeBatch: disjoint prefix, stop at sharer, strict-count guard") {
    // all disjoint, strictly decreasing → whole window batches
    assert(Bpe.selectMergeBatch(
      Seq("a b" -> 10L, "c d" -> 9L, "e f" -> 8L), 3)
      == Seq("a b" -> 10L, "c d" -> 9L, "e f" -> 8L))
    // sharer stops the PREFIX (no skipping past it)
    assert(Bpe.selectMergeBatch(
      Seq("a b" -> 10L, "b c" -> 9L, "d e" -> 8L), 3)
      == Seq("a b" -> 10L))
    // a later operand equal to an earlier MERGED symbol interacts too
    assert(Bpe.selectMergeBatch(Seq("a b" -> 10L, "ab c" -> 5L), 2)
      == Seq("a b" -> 10L))
    // strict-count guard: "c d" ties the excluded sharer "b x" (the
    // sequential run could prefer a pair the sharer's merge creates)
    assert(Bpe.selectMergeBatch(
      Seq("a b" -> 10L, "c d" -> 9L, "b x" -> 9L), 3)
      == Seq("a b" -> 10L))
    // window end: the first pair PAST maxBatch is the guard
    assert(Bpe.selectMergeBatch(
      Seq("a b" -> 10L, "c d" -> 9L, "e f" -> 9L), 2)
      == Seq("a b" -> 10L))
    // singleton window is always a valid batch of one
    assert(Bpe.selectMergeBatch(Seq("a b" -> 3L), 4) == Seq("a b" -> 3L))
  }

  test("distributed merge batching cuts job rounds, rules bit-identical") {
    import spark.implicits._
    // ten symbol-disjoint two-char words with strictly decreasing
    // frequency: round 1 can batch 8 merges, round 2 the other 2
    val words = Seq("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr", "st")
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(100 - i)(w) }.mkString(" ")
    val docs = Seq(text).toDF("text")
    def countJobs(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          n.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try { body; Thread.sleep(1000) } // listener bus drains async
      finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    def run(batch: Int): (Seq[(Long, String, String)], Int) = {
      spark.conf.set(Bpe.LocalVocabThresholdKey, "0")
      spark.conf.set(Bpe.MergeBatchKey, batch.toString)
      try {
        var rules: Seq[(Long, String, String)] = null
        val jobs = countJobs {
          rules = Bpe.train(docs, col("text"), merges = 10).collect()
            .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
        }
        (rules, jobs)
      } finally {
        spark.conf.unset(Bpe.LocalVocabThresholdKey)
        spark.conf.unset(Bpe.MergeBatchKey)
      }
    }
    val (seqRules, seqJobs) = run(batch = 1)
    val (batRules, batJobs) = run(batch = 8)
    assert(seqRules == batRules) // bit-identical rule sequence
    assert(seqRules.map(_._1) == (1L to 10L))
    assert(batJobs < seqJobs, s"batched $batJobs !< sequential $seqJobs")
    // and both equal the driver-side classic loop
    val local = Bpe.train(docs, col("text"), merges = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(local == batRules)
  }

  test("train: minFreq floor inert on disjoint singletons → merges AND counts identical") {
    import spark.implicits._
    // head words (freq ≥ 2) decide every merge; the singleton "xyz"
    // shares no letters with them, so pruning it perturbs no competing
    // pair count — pruned run must equal the unpruned run bit-for-bit
    val docs = Seq("low low lower xyz", "low lower").toDF("text")
    def run(minFreq: Long) =
      Bpe.train(docs, col("text"), merges = 3, minFreq = minFreq)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
    assert(run(1L) == run(2L))
    assert(run(2L).map(t => (t._2, t._3)) == Seq(("l", "o"), ("lo", "w"), ("e", "r")))
  }

  test("train: topV cut keeps the Zipf head; driver loop engages below threshold") {
    import spark.implicits._
    // distinct words: low(×3) lower(×2) xyz(×1) qqq(×1) → topV=2 keeps
    // low+lower (freq desc, word asc deterministic); merges match the
    // classic fixture
    val docs = Seq("low low lower xyz", "low lower qqq").toDF("text")
    val rules = Bpe.train(docs, col("text"), merges = 2, topV = 2)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(rules == Seq(("l", "o"), ("lo", "w")))
  }

  test("train: pruning makes the driver loop engage on a long-tail vocab") {
    import spark.implicits._
    // 40 distinct singleton junk words + a small head; with the
    // local-vocab threshold forced to 10 the unpruned run would take
    // the distributed path, but minFreq=2 prunes the tail to 2 words
    // → driver loop engages and still learns the head merges
    val junk = (1 to 40).map(i => f"zz$i%02d").mkString(" ")
    val docs = Seq(s"low low lower $junk", "low lower").toDF("text")
    spark.conf.set(Bpe.LocalVocabThresholdKey, "10")
    try {
      val rules = Bpe.train(docs, col("text"), merges = 2, minFreq = 2)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      assert(rules == Seq(("l", "o"), ("lo", "w")))
    } finally spark.conf.unset(Bpe.LocalVocabThresholdKey)
  }

  test("train: pruning composes with the distributed loop too") {
    import spark.implicits._
    val docs = Seq("low low lower xyz", "low lower").toDF("text")
    spark.conf.set(Bpe.LocalVocabThresholdKey, "0") // force distributed
    try {
      val rules = Bpe.train(docs, col("text"), merges = 3, minFreq = 2)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      // identical to the unpruned classic fixture — the floor only
      // drops the letter-disjoint singleton
      assert(rules == Seq(
        (1L, "l", "o", "lo", 5L),
        (2L, "lo", "w", "low", 5L),
        (3L, "e", "r", "er", 2L)))
    } finally spark.conf.unset(Bpe.LocalVocabThresholdKey)
  }

  test("encode: mapPartitions kernel ≡ Column-expression chain") {
    import spark.implicits._
    val docs = Seq((1L, "low lower low"), (2L, "wow  low"), (3L, ""),
      (4L, "aaaa baab")).toDF("doc_id", "text")
    val rules = Seq(("l", "o"), ("lo", "w"), ("a", "a"), ("e", "r"))
    def collectOut(limit: String) = {
      spark.conf.set(Bpe.ExprChainRuleLimitKey, limit)
      try Bpe.encode(docs, col("text"), col("doc_id"), rules)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      finally spark.conf.unset(Bpe.ExprChainRuleLimitKey)
    }
    val viaExpr = collectOut("64")
    val viaKernel = collectOut("0") // force the kernel path
    assert(viaExpr == viaKernel)
    assert(viaKernel.find(_._1 == 4L).get._3 == "aa aa b aa b")
  }

  test("train is a single corpus pass: merge steps never rescan documents") {
    import spark.implicits._
    val docs = Seq("alpha beta beta gamma").toDF("text")
    val rules = Bpe.train(docs, col("text"), merges = 2)
    // output is a driver-built local relation — by construction the
    // merge loop ran over the truncated word-frequency relation; just
    // pin determinism of the result here
    assert(rules.count() == 2)
  }
}
