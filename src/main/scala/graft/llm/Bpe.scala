package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Lineage.TruncateOps

/** Distributed BPE tokenizer TRAINING — merge-rule learning over the
  * word-frequency relation, the way industrial tokenizer trainers
  * shape it for corpus scale:
  *
  *   1. ONE corpus pass builds the (word, freq) table — everything
  *      after that touches only the vocab-sized relation, never the
  *      corpus again;
  *   2. each merge step is one adjacent-pair aggregate (map-side
  *      partials over the symbol arrays, weighted by word freq), a
  *      1-row top-pair selection (count desc, pair asc — fully
  *      deterministic), and a map-only merge application over the
  *      vocab relation, lineage-cut per step so the loop's plan stays
  *      constant-size.
  *
  * Merge application uses replace-scan semantics: the space-joined
  * symbol string replaces ` left right ` with ` leftright ` in
  * left-to-right non-overlapping passes, iterated [[MergePasses]]
  * times (a fixpoint for words up to 2^passes symbols). Both engines
  * (Spark `replace`, DuckDB `replace`) implement the same literal
  * scan, which is what makes the op oracle-checkable; it coincides
  * with the classic single-scan greedy application except on runs of
  * four-plus identical symbols, where the pass boundary can pick a
  * different (equally valid) pairing.
  *
  * Symbols never contain spaces (words come from whitespace
  * splitting), so the space-joined representation is unambiguous at
  * any merge depth.
  */
object Bpe {

  /** Replace passes per merge application — fixpoint for words up to
    * 2^6 = 64 symbols, far past natural word lengths.
    */
  val MergePasses = 6

  /** UTF-8 byte-order string comparison — Spark's UTF8String and
    * DuckDB's binary collation order; differs from String.compareTo
    * only for supplementary-plane characters.
    */
  private[graft] val utf8Ordering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(ab.length, bb.length)
      var i = 0
      while (i < n) {
        val d = (ab(i) & 0xff) - (bb(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      ab.length - bb.length
    }
  }

  /** Space-joined initial symbol string of a word: one character per
    * symbol (`"abc"` → `"a b c"`).
    */
  def charSymbols(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** One merge application with replace-scan semantics: space-wrap,
    * replace ` l r ` with ` lr ` [[MergePasses]] times, unwrap.
    */
  def applyMerge(symbols: Column, left: Column, right: Column): Column = {
    val pat = concat(lit(" "), left, lit(" "), right, lit(" "))
    val rep = concat(lit(" "), left, right, lit(" "))
    var s = concat(lit(" "), symbols, lit(" "))
    for (_ <- 0 until MergePasses) s = replace(s, pat, rep)
    trim(s)
  }

  /** Adjacent symbol pairs of a space-joined symbol string, as
    * `"left right"` strings (empty array for single-symbol words).
    * Shared with [[WordPiece]] — one spelling for both families.
    */
  private[llm] def adjacentPairs(symbols: Column): Column = {
    val ss = split(symbols, " ")
    filter(
      zip_with(ss, slice(ss, lit(2), size(ss)), (a, b) => concat_ws(" ", a, b)),
      p => p.isNotNull && p.contains(" "))
  }

  /** Learn `merges` BPE merge rules from a corpus. Returns one row
    * per learned rule: (step, lhs, rhs, merged, n) where `n` is
    * the frequency-weighted adjacent-pair count that won the step.
    * Ties break on pair text ascending, so the whole run is
    * deterministic on any engine.
    */
  /** Vocab-count ceiling for the driver-side training loop. A real
    * tokenizer run is ~30k merges; per-merge distributed jobs would
    * be 30k job rounds, while the word-frequency table (what the loop
    * actually iterates over) is vocab-sized and fits the driver on
    * any natural-language corpus — so below the bound the classic
    * in-memory loop runs with IDENTICAL semantics (same replace-scan
    * application, same tie-breaks; `java.lang.String.replace` and
    * Spark's `replace` are the same literal left-to-right scan).
    * Override with `spark.conf.set("graft.bpe.localVocabThreshold",…)`;
    * 0 forces the distributed loop.
    */
  val LocalVocabThresholdKey = "graft.bpe.localVocabThreshold"

  /** Max merges applied per distributed round (default 8). Each round
    * is one pair-count aggregate + one map-only application job, so
    * the job count for M merges drops from M rounds to ~M/batch —
    * without changing a single learned rule (see [[selectMergeBatch]]
    * for the exactness argument).
    */
  val MergeBatchKey = "graft.bpe.mergeBatch"

  /** The maximal rank-prefix of `ranked` (already ordered by count
    * desc, pair text asc UTF-8) that can be merged in ONE round while
    * staying bit-identical to applying one merge per round:
    *
    *  1. PREFIX, not subset: scanning in rank order stops at the
    *     first candidate that interacts with an already-selected pair
    *     — skipping it would let the sequential run see its (changed)
    *     count before later selections.
    *  2. Non-interaction is string-disjointness over
    *     {left, right, left+right} of every selected pair: applying
    *     " l r " → " lr " only changes counts of pairs touching `l`,
    *     `r` (decrease) or the new symbol `lr` (created), so a
    *     disjoint pair's count is invariant — including the corner
    *     where a later candidate's operand string-equals an earlier
    *     MERGED symbol (e.g. batching ("a","b") with ("ab","c")),
    *     which the `l+r` term excludes.
    *  3. Strict-count guard: every selected pair after the first must
    *     strictly out-count the first EXCLUDED pair (the stop point,
    *     or the first pair past the window). Pairs created/changed by
    *     earlier applications in the batch are bounded by that
    *     excluded count, so at each sub-step the sequential run's
    *     argmax is exactly the next selected pair — even under count
    *     ties, because the prefix preserves the (count, text) order.
    *
    * Always returns at least one pair when `ranked` is non-empty (a
    * single merge is trivially exact).
    */
  private[llm] def selectMergeBatch(
      ranked: Seq[(String, Long)], maxBatch: Int): Seq[(String, Long)] = {
    if (ranked.isEmpty) return Seq.empty
    val used = scala.collection.mutable.HashSet.empty[String]
    val sel = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var stopCount = Long.MinValue // count of the first excluded pair
    var i = 0
    var stopped = false
    while (i < ranked.length && !stopped && sel.length < maxBatch) {
      val (pair, n) = ranked(i)
      val Array(l, r) = pair.split(" ", 2)
      if (sel.isEmpty || (!used(l) && !used(r) && !used(l + r))) {
        sel += ((pair, n)); used += l; used += r; used += l + r
      } else { stopped = true; stopCount = n }
      i += 1
    }
    if (!stopped && i < ranked.length) stopCount = ranked(i)._2
    // guard 3: drop tail pairs that do not strictly out-count the
    // first excluded pair (they run in a later round instead)
    while (sel.length > 1 && sel.last._2 <= stopCount) sel.remove(sel.length - 1)
    sel.toSeq
  }

  /** Learn `merges` BPE merge rules from a corpus.
    *
    * `minFreq` / `topV` bound the word-frequency relation BEFORE the
    * merge loop — the knob that makes training corpus-scale-safe. A
    * 100 TB web corpus has tens of millions of distinct "words" (URLs,
    * hex hashes, typos), which would keep the driver-side classic loop
    * from ever engaging; a frequency floor (`freq >= minFreq`) or a
    * top-V cut (keep the `topV` most frequent words, ties on word text
    * ascending for determinism) shrinks the relation to the Zipf head
    * that actually decides the merges. Both prunes are one extra
    * filter / TakeOrdered over the already vocab-sized relation — the
    * corpus is still scanned exactly once.
    *
    * Approximation contract: pruning is exact whenever every step's
    * winning pair beats the runner-up by more than the pruned
    * frequency mass. A word of frequency f and s symbols contributes
    * at most f·(s−1) to ANY pair count, so the total perturbation of
    * any pair count is bounded by Σ_pruned freq·(symbols−1) — on a
    * Zipfian corpus with counts in the billions for head pairs and a
    * floor of a few occurrences, orders of magnitude below every
    * early-merge margin. The bound is computed (one aggregate over
    * the vocab-sized pruned complement) and logged so a run can audit
    * its own exactness; `minFreq = 1, topV = 0` (the defaults)
    * disable pruning and reproduce the unpruned result bit-for-bit.
    */
  def train(
      docs: DataFrame,
      textCol: Column,
      merges: Int,
      minFreq: Long = 1L,
      topV: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val pruning = minFreq > 1L || topV > 0
    // pass 1 (the ONLY corpus pass): word-frequency table. Truncated
    // separately only when pruning needs to consume it twice (kept +
    // audit complement); unpruned stays the single cut below.
    val wf0raw = docs
      .select(explode(split(trim(textCol), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val wf0 = if (pruning) wf0raw.truncateLineageDeferred() else wf0raw
    val floored = if (minFreq > 1L) wf0.where(col("freq") >= minFreq) else wf0
    val kept =
      if (topV > 0)
        // TakeOrdered over the vocab-sized relation — deterministic
        // (freq desc, word asc), no global sort materialized
        floored.orderBy(col("freq").desc, col("w").asc).limit(topV)
      else floored
    if (pruning) {
      // audit the approximation: max perturbation of any pair count
      // is the pruned words' Σ freq·(symbols−1)
      val bound = wf0.exceptAll(kept)
        .select(sum(col("freq") * (length(col("w")) - 1)).as("b"))
        .collect().headOption.flatMap(r => Option(r.get(0)).map(_.toString))
        .getOrElse("0")
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"Bpe.train pruning engaged (minFreq=$minFreq, topV=$topV): " +
          s"pair-count perturbation bound = $bound; merges whose winning " +
          "margin exceeds this are provably identical to the unpruned run")
    }
    var wf = kept
      .select(charSymbols(col("w")).as("sym"), col("freq"))
      .truncateLineageDeferred()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    val localMax = spark.conf.getOption(LocalVocabThresholdKey)
      .map(_.toLong).getOrElse(1000000L)
    if (localMax > 0 && wf.count() <= localMax) {
      // driver-side classic loop over the collected vocab
      var vocab = wf.collect().map(r => (r.getString(0), r.getLong(1)))
      for (step <- 1 to merges) {
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        for ((sym, freq) <- vocab) {
          val ss = sym.split(" ")
          var i = 0
          while (i < ss.length - 1) {
            val p = ss(i) + " " + ss(i + 1)
            counts(p) = counts.getOrElse(p, 0L) + freq
            i += 1
          }
        }
        if (counts.nonEmpty) {
          // tie-break in UTF-8 BYTE order, matching the distributed
          // orderBy (UTF8String) and DuckDB's binary collation —
          // String.compareTo is UTF-16 code-unit order, which
          // disagrees for supplementary-plane vs U+E000..U+FFFF chars
          val (pair, n) = counts.minBy { case (p, c) => (-c, p) }(
            Ordering.Tuple2(Ordering.Long, utf8Ordering))
          val Array(l, r) = pair.split(" ", 2)
          learned += ((step, l, r, l + r, n))
          val pat = " " + pair + " "
          val rep = " " + l + r + " "
          vocab = vocab.map { case (sym, freq) =>
            var s = " " + sym + " "
            var k = 0
            while (k < MergePasses) { s = s.replace(pat, rep); k += 1 }
            (s.trim, freq)
          }
        }
      }
    } else {
      // distributed loop with EXACT merge batching: each round counts
      // pairs once, collects the top (batch+1) and applies the
      // provably-non-interacting rank prefix ([[selectMergeBatch]]) in
      // ONE map-only pass — cutting the job rounds ~batch× while
      // remaining bit-identical to the one-merge-per-round loop.
      val batchMax = math.max(1, spark.conf.getOption(MergeBatchKey)
        .map(_.toInt).getOrElse(8))
      var step = 1
      var exhausted = false
      while (step <= merges && !exhausted) {
        val want = math.min(batchMax, merges - step + 1)
        val top = wf
          .select(explode(adjacentPairs(col("sym"))).as("pair"), col("freq"))
          .groupBy("pair").agg(sum("freq").as("n"))
          .orderBy(col("n").desc, col("pair").asc)
          .limit(want + 1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val ranked = top.map(r => (r.getString(0), r.getLong(1))).toSeq
          val batch = selectMergeBatch(ranked, want)
          var sym = col("sym")
          batch.foreach { case (pair, n) =>
            val Array(l, r) = pair.split(" ", 2)
            learned += ((step, l, r, l + r, n))
            step += 1
            sym = applyMerge(sym, lit(l), lit(r))
          }
          wf = wf.select(sym.as("sym"), col("freq")).truncateLineageDeferred()
        }
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("step", "lhs", "rhs", "merged", "n")
      .select(col("step").cast("long").as("step"), col("lhs"), col("rhs"),
        col("merged"), col("n"))
  }

  /** Rule-count ceiling for the per-rule Column-expression chain in
    * [[encode]]. Each rule adds [[MergePasses]] nested `replace`
    * calls, so the expression tree grows 6× linearly with rule count
    * and a realistic ~30k-merge vocabulary would blow past analyzer /
    * codegen limits. Above the bound, encoding switches to a
    * `mapPartitions` kernel (same replace-scan semantics —
    * `java.lang.String.replace` is the identical literal left-to-right
    * scan — with a per-partition distinct-word memo, the natural shape
    * for a production tokenizer pass). Override with
    * `spark.conf.set("graft.bpe.exprChainRuleLimit", …)`.
    */
  val ExprChainRuleLimitKey = "graft.bpe.exprChainRuleLimit"

  /** Local twin of [[charSymbols]] + the full [[applyMerge]] rule
    * chain: one code point per initial symbol, then each rule applied
    * as [[MergePasses]] literal replace-scan passes, in rule order.
    */
  private[llm] def encodeWordLocal(
      word: String, rules: Array[(String, String)]): String = {
    val sb = new java.lang.StringBuilder(word.length * 2 + 2)
    sb.append(' ')
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.appendCodePoint(cp)
      sb.append(' ')
      i += Character.charCount(cp)
    }
    var s = sb.toString // " a b c " — space-wrapped throughout
    var r = 0
    while (r < rules.length) {
      val (l, rt) = rules(r)
      val pat = " " + l + " " + rt + " "
      if (s.contains(pat)) {
        val rep = " " + l + rt + " "
        var k = 0
        while (k < MergePasses) { s = s.replace(pat, rep); k += 1 }
      }
      r += 1
    }
    s.trim
  }

  /** Tokenize with a learned merge list: apply each rule in order to
    * every word — map-only over the corpus, the serving-side pair of
    * [[train]]. Returns (id, n_tokens, tokens_str): token count and
    * the space-joined token stream per document.
    *
    * Small rule lists compile to a pure Column-expression chain
    * (whole-stage codegen); rule lists past [[ExprChainRuleLimitKey]]
    * run the `mapPartitions` kernel instead — identical semantics,
    * constant-size plan, per-partition word memo (Zipf makes the memo
    * hit rate ≈ 1 on natural text).
    */
  def encode(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      rules: Seq[(String, String)]): DataFrame = {
    val exprLimit = docs.sparkSession.conf
      .getOption(ExprChainRuleLimitKey).map(_.toInt).getOrElse(64)
    if (rules.size > exprLimit) return encodeKernel(docs, textCol, idCol, rules)
    // greedy per-word merge chain is the cost — spread a single-split
    // input across the session first (no-op at corpus scale)
    val spread = graft.Tuning.spreadTinyInput(docs)
    val words = spread.select(idCol.as("doc_id"),
      transform(
        filter(split(trim(textCol), "\\s+"), w => w =!= ""),
        w => {
          var s = charSymbols(w)
          for ((l, r) <- rules) s = applyMerge(s, lit(l), lit(r))
          s
        }).as("ws"))
    words.select(col("doc_id"),
      aggregate(col("ws"), lit(0L),
        (acc, w) => acc + size(split(w, " "))).as("n_tokens"),
      array_join(col("ws"), " ").as("tokens_str"))
  }

  /** `mapPartitions` encoding path for large rule lists — still
    * map-only over the corpus (no shuffle), rules shipped once per
    * task in the closure, words memoized per partition (bounded).
    */
  private def encodeKernel(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      rules: Seq[(String, String)]): DataFrame = {
    val pre = graft.Tuning.spreadTinyInput(
      docs.select(idCol.as("doc_id"), textCol.as("__text")))
    val idField = pre.schema.head
    val outSchema = StructType(Seq(
      StructField("doc_id", idField.dataType, idField.nullable),
      StructField("n_tokens", LongType, nullable = true),
      StructField("tokens_str", StringType, nullable = true)))
    val rulesArr = rules.toArray
    val MemoCap = 1 << 20 // per-partition distinct-word memo bound
    pre.mapPartitions { it =>
      val memo = new java.util.HashMap[String, String]()
      it.map { row =>
        val id = row.get(0)
        val text = row.getString(1)
        if (text == null) Row(id, null, null)
        else {
          val ws = text.trim.split("\\s+")
          var n = 0L
          val sb = new java.lang.StringBuilder
          var first = true
          var i = 0
          while (i < ws.length) {
            val w = ws(i)
            if (w.nonEmpty) {
              var enc = memo.get(w)
              if (enc == null) {
                enc = encodeWordLocal(w, rulesArr)
                if (memo.size < MemoCap) memo.put(w, enc)
              }
              var sp = 0
              var j = 0
              while (j < enc.length) { if (enc.charAt(j) == ' ') sp += 1; j += 1 }
              n += sp + 1
              if (!first) sb.append(' ')
              sb.append(enc)
              first = false
            }
            i += 1
          }
          Row(id, n, sb.toString)
        }
      }
    }(Encoders.row(outSchema))
  }
}
