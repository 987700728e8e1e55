package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Lineage.TruncateOps

/** Distributed WordPiece tokenizer training + encoding — the third
  * tokenizer family next to [[Bpe]] (count-scored merges) and
  * [[Unigram]] (Viterbi-EM), completing the set used by practically
  * every published LM pipeline (Schuster & Nakajima 2012; Wu et al.
  * 2016 §4.1; the `##` continuation convention and greedy
  * longest-match-first inference as popularized by BERT's tokenizer).
  *
  * Structure mirrors [[Bpe.train]]: ONE corpus pass builds the
  * (symbol-string, freq) vocab relation, then every training step
  * touches only that relation. What differs is the objective: a merge
  * candidate (l, r) is scored by the likelihood ratio
  * `count(lr) / (count(l) · count(r))` — the pair count relative to
  * its operands' unigram counts — so rare-but-exclusive pairs win
  * over merely-frequent ones. Word-internal continuation symbols
  * carry the `##` prefix; merging strips the right operand's prefix
  * (`a + ##b → ab`, `##a + ##b → ##ab`).
  *
  * Scale notes. Each step needs BOTH a pair aggregate and a unigram
  * aggregate over the vocab relation. Unlike BPE, merge batching is
  * NOT exactness-safe here: a ratio score can JUMP for pairs touching
  * a freshly created symbol (small new denominator), so the
  * strict-count guard of [[Bpe.selectMergeBatch]] has no analogue —
  * the distributed loop runs one merge per round, and the driver-side
  * classic loop (identical semantics) engages below the same
  * vocab-count threshold as BPE. For a corpus-scale trainer with one
  * job per round at ANY vocab size, [[Unigram]] remains the right
  * tool; WordPiece's inference-side encode IS corpus-scale (map-only,
  * constant plan).
  *
  * Convention caveat (shared with every classic WordPiece): a literal
  * `#` in corpus text is not escaped, so a word like `a#b` yields
  * symbols that can collide with the continuation prefix. Both
  * engines implement the identical string convention, so the oracle
  * gate is unaffected; documents corpora that tokenize `#` should
  * pre-normalize.
  */
object WordPiece {

  /** Space-joined WordPiece symbols of a word: first character plain,
    * every later character `##`-prefixed (`"abc"` → `"a ##b ##c"`).
    * Built from [[Bpe.charSymbols]] so the char-split convention
    * (and its astral-plane caveat) is shared with BPE verbatim.
    */
  def wpSymbols(word: Column): Column =
    replace(Bpe.charSymbols(word), lit(" "), lit(" ##"))

  /** Merged symbol text of a pair: left ++ right with the right's
    * continuation prefix stripped.
    */
  private[llm] def mergedSymbol(l: String, r: String): String =
    l + (if (r.startsWith("##")) r.substring(2) else r)

  /** One merge application, replace-scan semantics identical to
    * [[Bpe.applyMerge]] but with the `##`-stripping merge target.
    */
  def applyMerge(symbols: Column, left: String, right: String): Column = {
    val pat = lit(" " + left + " " + right + " ")
    val rep = lit(" " + mergedSymbol(left, right) + " ")
    var s = concat(lit(" "), symbols, lit(" "))
    for (_ <- 0 until Bpe.MergePasses) s = replace(s, pat, rep)
    trim(s)
  }

  /** Learn `merges` WordPiece merge rules. Returns one row per rule:
    * (step, lhs, rhs, merged, n) with `n` the winning pair's
    * freq-weighted count (the score's numerator; the score itself is
    * `n / (count(lhs)·count(rhs))` and both engines compute it with
    * the identical double spelling, so the CHOICE is oracle-checked
    * through the emitted rule sequence). Ties break on score desc,
    * then pair text ascending UTF-8 — deterministic on any engine.
    */
  def train(docs: DataFrame, textCol: Column, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    var wf = docs
      .select(explode(split(trim(textCol), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(wpSymbols(col("w")).as("sym"), col("freq"))
      .truncateLineageDeferred()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    val localMax = spark.conf.getOption(Bpe.LocalVocabThresholdKey)
      .map(_.toLong).getOrElse(1000000L)
    if (localMax > 0 && wf.count() <= localMax) {
      // driver-side classic loop — semantics identical to the
      // distributed branch (same aggregates, same double score
      // spelling, same UTF-8 tie order)
      var vocab = wf.collect().map(r => (r.getString(0), r.getLong(1)))
      for (step <- 1 to merges) {
        val pairs = scala.collection.mutable.HashMap.empty[String, Long]
        val units = scala.collection.mutable.HashMap.empty[String, Long]
        for ((sym, freq) <- vocab) {
          val ss = sym.split(" ")
          var i = 0
          while (i < ss.length) {
            units(ss(i)) = units.getOrElse(ss(i), 0L) + freq
            if (i < ss.length - 1) {
              val p = ss(i) + " " + ss(i + 1)
              pairs(p) = pairs.getOrElse(p, 0L) + freq
            }
            i += 1
          }
        }
        if (pairs.nonEmpty) {
          val scored = pairs.map { case (p, n) =>
            val Array(l, r) = p.split(" ", 2)
            // double division/multiplication are exactly rounded IEEE
            // ops: identical integer inputs give the identical double
            // on both engines — the same portability argument as the
            // Kneser–Ney scorer
            (p, n, n.toDouble / (units(l).toDouble * units(r).toDouble))
          }
          val (pair, n, _) = scored.minBy { case (p, _, s) => (-s, p) }(
            Ordering.Tuple2(Ordering.Double.TotalOrdering, Bpe.utf8Ordering))
          val Array(l, r) = pair.split(" ", 2)
          learned += ((step, l, r, mergedSymbol(l, r), n))
          val pat = " " + pair + " "
          val rep = " " + mergedSymbol(l, r) + " "
          vocab = vocab.map { case (sym, freq) =>
            var s = " " + sym + " "
            var k = 0
            while (k < Bpe.MergePasses) { s = s.replace(pat, rep); k += 1 }
            (s.trim, freq)
          }
        }
      }
    } else {
      // distributed loop: one merge per round (ratio scores forbid
      // BPE-style exact batching — see the scaladoc), each round one
      // pair aggregate + one unigram aggregate + a 1-row top +
      // map-only application, lineage-cut so the plan stays constant;
      // exhaustion (no pairs left) stops the loop like Bpe.train's
      var step = 1
      var exhausted = false
      while (step <= merges && !exhausted) {
        val ss = split(col("sym"), " ")
        val units = wf
          .select(explode(ss).as("u"), col("freq"))
          .groupBy("u").agg(sum("freq").as("cu"))
        val top = wf
          .select(explode(Bpe.adjacentPairs(col("sym"))).as("pair"), col("freq"))
          .groupBy("pair").agg(sum("freq").as("n"))
          .withColumn("l", split(col("pair"), " ").getItem(0))
          .withColumn("r", split(col("pair"), " ").getItem(1))
          .join(broadcast(units.withColumnRenamed("u", "l")
            .withColumnRenamed("cu", "cl")), Seq("l"))
          .join(broadcast(units.withColumnRenamed("u", "r")
            .withColumnRenamed("cu", "cr")), Seq("r"))
          .select(col("pair"), col("n"),
            (col("n").cast("double") /
              (col("cl").cast("double") * col("cr").cast("double"))).as("score"))
          .orderBy(col("score").desc, col("pair").asc)
          .limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val row = top.head
          val pair = row.getString(0)
          val Array(l, r) = pair.split(" ", 2)
          learned += ((step, l, r, mergedSymbol(l, r), row.getLong(1)))
          wf = wf.select(applyMerge(col("sym"), l, r).as("sym"), col("freq"))
            .truncateLineageDeferred()
          step += 1
        }
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("step", "lhs", "rhs", "merged", "n")
      .select(col("step").cast("long").as("step"), col("lhs"), col("rhs"),
        col("merged"), col("n"))
  }

  /** The training corpus's initial alphabet: every single-character
    * symbol (`c` at word starts, `##c` inside words) with its
    * freq-weighted count — the base vocabulary greedy inference falls
    * back on, which is what guarantees encode never hits `[UNK]` on
    * the corpus it was trained on.
    */
  def alphabet(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(split(trim(textCol), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(explode(split(wpSymbols(col("w")), " ")).as("token"), col("freq"))
      .groupBy("token").agg(sum("freq").as("n"))

  /** Greedy longest-match-first encode of one word against a vocab
    * set (BERT-style): at each position take the LONGEST vocab token
    * matching the remainder (`##`-prefixed lookups past position 0);
    * if nothing matches, the WHOLE word becomes `[UNK]` — the classic
    * all-or-nothing failure mode.
    */
  private[llm] def encodeWordLocal(
      word: String, vocab: java.util.Set[String], maxTokenCps: Int): String = {
    val sb = new java.lang.StringBuilder(word.length * 2)
    var pos = 0
    while (pos < word.length) {
      // "longest" is measured in CODE POINTS, not UTF-16 units — the
      // DuckDB twin ranks candidates by `length()` (code points), so a
      // 2-astral-char token must not outrank a 3-BMP-char one here
      var end = pos
      var cps = 0
      while (cps < maxTokenCps && end < word.length) {
        end = word.offsetByCodePoints(end, 1)
        cps += 1
      }
      var matched: String = null
      while (matched == null && end > pos) {
        val cand =
          (if (pos == 0) "" else "##") + word.substring(pos, end)
        if (vocab.contains(cand)) matched = cand
        else end = word.offsetByCodePoints(end, -1)
      }
      if (matched == null) return "[UNK]"
      if (sb.length > 0) sb.append(' ')
      sb.append(matched)
      pos = end
    }
    if (sb.length == 0) "[UNK]" else sb.toString
  }

  /** Tokenize with a trained vocabulary (alphabet ∪ merged tokens):
    * map-only over the corpus, `mapPartitions` kernel with the vocab
    * shipped once per task and a per-partition distinct-word memo —
    * the same constant-size-plan shape as [[Bpe.encode]]'s kernel
    * path. Returns (doc_id, n_tokens, tokens_str).
    */
  def encode(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      vocab: Seq[String]): DataFrame = {
    val pre = graft.Tuning.spreadTinyInput(
      docs.select(idCol.as("doc_id"), textCol.as("__text")))
    val idField = pre.schema.head
    val outSchema = StructType(Seq(
      StructField("doc_id", idField.dataType, idField.nullable),
      StructField("n_tokens", LongType, nullable = true),
      StructField("tokens_str", StringType, nullable = true)))
    // longest token in CODE POINTS, with the ## prefix excluded from
    // the match length (the greedy matcher compares in code points)
    val maxTokenChars = vocab.iterator
      .map { t =>
        val body = if (t.startsWith("##")) t.substring(2) else t
        body.codePointCount(0, body.length)
      }
      .foldLeft(1)(math.max)
    val vocabArr = vocab.toArray
    val MemoCap = 1 << 20
    pre.mapPartitions { it =>
      val vs: java.util.Set[String] = new java.util.HashSet[String](
        java.util.Arrays.asList(vocabArr: _*))
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
                enc = encodeWordLocal(w, vs, maxTokenChars)
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
