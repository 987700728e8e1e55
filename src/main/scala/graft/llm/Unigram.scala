package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.Lineage.TruncateOps

/** Distributed unigram-LM tokenizer training (the SentencePiece
  * family, Kudo & Richardson 2018) — the second of the two tokenizer
  * algorithms industrial LLM pipelines actually train, and at corpus
  * scale the BETTER-shaped one: where BPE's distributed fallback
  * needs one job round per merge rule (see [[Bpe.train]]), unigram
  * training is one job PER EM ITERATION regardless of vocabulary
  * size — seed once, then each round broadcasts the vocab-sized
  * piece table, Viterbi-segments the word-frequency relation in a
  * single map pass with map-side partial counts, and re-estimates on
  * the driver from the vocab-sized aggregate. ~10 rounds total for a
  * production run, at ANY corpus size.
  *
  *   1. ONE corpus pass builds the (word, freq) relation (the same
  *      `minFreq`/`topV` corpus-scale pruning knobs as [[Bpe.train]]);
  *   2. seeding counts every substring of length 1..`maxPieceLen` of
  *      every distinct word (freq-weighted, an in-row expansion —
  *      no shuffle beyond the piece aggregate) and keeps the most
  *      frequent `seedSize` multi-char pieces plus ALL single
  *      characters (so every word always has a segmentation);
  *   3. each EM round: E-step = deterministic Viterbi segmentation of
  *      each word under the current piece log-probabilities
  *      (freq-weighted occurrence counts, integer arithmetic in the
  *      aggregate); M-step = re-normalize counts into probabilities
  *      on the driver (vocab-sized);
  *   4. after `emIters` rounds the vocabulary is pruned to
  *      `vocabSize` (all single characters are always retained; the
  *      remaining slots go to the highest-count multi-char pieces,
  *      ties on piece text ascending in UTF-8 byte order), then one
  *      final EM round runs on the pruned vocabulary so the reported
  *      counts/log-probs reflect the shipped piece table.
  *
  * Declared simplification vs the paper: hard (Viterbi) EM instead of
  * forward-backward expected counts, and count-based pruning instead
  * of the likelihood-loss ranking — the standard "Viterbi-EM"
  * variant. Every step is integer-count-based and tie-broken
  * explicitly, and log-probabilities are snapped to the 2^-20 grid
  * ([[quantizeLogp]]) so even the per-word DP sums are EXACT double
  * arithmetic — training is bit-deterministic on any partitioning
  * AND engine-portable, which is what lets the full train→encode
  * loop sit under the DuckDB hash oracle (the twin replays the same
  * Viterbi-EM as bounded recursive CTEs).
  *
  * Smoothing: single-character pieces get add-one smoothing
  * (`effCount = count + 1`); multi-char pieces use raw counts and are
  * dropped when their count reaches zero. This keeps zero-count
  * required characters representable with a finite log-probability
  * using only integer-derived arithmetic (no tuning constants).
  *
  * The driver/distributed switch mirrors [[Bpe.train]]: below
  * [[LocalVocabThresholdKey]] distinct words the word relation is
  * collected once and the loop runs in memory with the IDENTICAL
  * kernels; above it, each E-step is the one distributed job
  * described above. Both paths share [[viterbi]]/[[mstep]], so the
  * result is the same by construction (pinned in `UnigramSpec`).
  */
object Unigram {

  /** Distinct-word ceiling for the driver-side EM loop; above it the
    * per-round distributed E-step runs (still one job per round).
    * Override with `spark.conf.set("graft.unigram.localVocabThreshold",…)`;
    * 0 forces the distributed path.
    */
  val LocalVocabThresholdKey = "graft.unigram.localVocabThreshold"

  /** Log-probability charged for a character absent from the piece
    * table (possible only when `minFreq`/`topV` pruned its every
    * containing word): the word still segments, charging this fixed
    * penalty per unknown character — deterministic and far below any
    * real piece's log-prob.
    */
  val UnkLogp: Double = -1e4

  /** (word, freq) relation — the single corpus pass, with the same
    * corpus-scale pruning contract as [[Bpe.train]] (frequency floor
    * and/or top-V cut over the vocab-sized relation).
    */
  private def wordFreq(
      docs: DataFrame, textCol: Column, minFreq: Long, topV: Int): DataFrame = {
    val wf = docs
      .select(explode(split(trim(textCol), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val floored = if (minFreq > 1L) wf.where(col("freq") >= minFreq) else wf
    if (topV > 0) floored.orderBy(col("freq").desc, col("w").asc).limit(topV)
    else floored
  }

  /** Freq-weighted counts of every substring of length
    * 1..`maxPieceLen` across distinct words — the unigram seed
    * statistic, exposed as its own top-K query (hash-gated against a
    * DuckDB twin). In-row (start, len) expansion: no join, one
    * shuffle for the piece aggregate, top-K via heap — the plan shape
    * survives any corpus size because everything after the corpus
    * pass is piece-keyed.
    */
  /** Every substring of length 1..`maxPieceLen` of `w`, as an in-row
    * (start, len) expansion — THE seed expression, shared by
    * [[seedPieces]] (what the DuckDB oracle gates) and [[train]]
    * (what training actually uses), so they cannot drift apart.
    */
  private def substringPieces(w: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(1), length(w)), i =>
      transform(
        sequence(lit(1), least(length(w) - i + 1, lit(maxPieceLen))),
        l => w.substr(i, l))))

  def seedPieces(
      docs: DataFrame, textCol: Column, maxPieceLen: Int, topK: Int): DataFrame = {
    val wf = wordFreq(docs, textCol, 1L, 0)
    val subs = substringPieces(col("w"), maxPieceLen)
    val counts = wf
      .select(explode(subs).as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("n"))
    val w = Window.orderBy(col("n").desc, col("piece").asc)
    counts.orderBy(col("n").desc, col("piece").asc).limit(topK)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Deterministic Viterbi segmentation of `word` under piece
    * log-probs: maximize Σ logp; ties prefer fewer pieces, then the
    * longest final piece (scan order makes this well-defined without
    * any hashing). Characters missing from the table become UNK
    * pieces at [[UnkLogp]], so every word segments.
    *
    * The DP runs over CODE-POINT boundaries, and `maxLen` counts code
    * points — exactly the semantics of the in-plan `length`/`substr`
    * that seeded the piece table (and of the DuckDB oracle twin), so
    * a piece of m supplementary-plane characters is reachable
    * whenever m ≤ maxLen; an astral character never splits into lone
    * surrogates (the single-code-point UNK step consumes the whole
    * pair).
    *
    * With [[mstep]]'s grid-quantized log-probs every DP sum is EXACT
    * double arithmetic, so the `sc == best` tie comparison is
    * engine-portable — the SQL twin reproduces the identical
    * segmentation, not just a close one.
    */
  private[llm] def viterbi(
      word: String,
      logp: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    // code-point boundaries: bnd(0)=0 < … < bnd(m)=n in UTF-16 units
    val bnd = new Array[Int](n + 1)
    var m = 0
    var pos = 0
    while (pos < n) {
      bnd(m) = pos
      m += 1
      pos += (if (Character.isHighSurrogate(word.charAt(pos)) && pos + 1 < n &&
        Character.isLowSurrogate(word.charAt(pos + 1))) 2 else 1)
    }
    bnd(m) = n
    val best = new Array[Double](m + 1)
    val cnt = new Array[Int](m + 1)
    val back = new Array[Int](m + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    java.util.Arrays.fill(back, -1)
    best(0) = 0.0
    var k = 1
    while (k <= m) {
      var j = math.max(0, k - maxLen)
      while (j < k) {
        val lp = logp.get(word.substring(bnd(j), bnd(k)))
        if (lp != null) {
          val sc = best(j) + lp.doubleValue()
          val c = cnt(j) + 1
          if (sc > best(k) || (sc == best(k) && c < cnt(k))) {
            best(k) = sc; cnt(k) = c; back(k) = j
          }
        }
        j += 1
      }
      if (back(k) == -1) { // OOV code point — forced single-cp UNK
        best(k) = best(k - 1) + UnkLogp
        cnt(k) = cnt(k - 1) + 1
        back(k) = k - 1
      }
      k += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[String](cnt(m))
    var t = m
    while (t > 0) { val j = back(t); out += word.substring(bnd(j), bnd(t)); t = j }
    out.reverseIterator.toArray
  }

  /** M-step + prune: keep every single-character piece (add-one
    * smoothed) and, when `vocabSize > 0`, the top
    * `vocabSize - #chars` multi-char pieces by (count desc, piece asc
    * UTF-8); multi-char pieces at count 0 drop regardless. Returns
    * the kept (piece, count) in final rank order plus the log-prob
    * table for the next E-step.
    */
  private[llm] def mstep(
      counts: collection.Map[String, Long],
      chars: Iterable[String],
      vocabSize: Int): (Array[(String, Long)], java.util.HashMap[String, java.lang.Double]) = {
    val charArr = chars.toArray
    val charSet = charArr.toSet
    val charRows = charArr.map(c => (c, counts.getOrElse(c, 0L)))
    var multi = counts.iterator
      .filter { case (p, c) => c > 0L && !charSet.contains(p) }
      .toArray
    val ord = Ordering.Tuple2(Ordering.Long.reverse, Bpe.utf8Ordering)
      .on[(String, Long)] { case (p, c) => (c, p) }
    multi = multi.sorted(ord)
    if (vocabSize > 0 && multi.length > math.max(0, vocabSize - charRows.length))
      multi = multi.take(math.max(0, vocabSize - charRows.length))
    val kept = (charRows ++ multi).sorted(ord)
    // add-one smoothing applies exactly to the forced char set (the
    // in-plan `length(piece) === 1` pieces — code points, so an
    // astral char across 2 UTF-16 units is still a "char" here)
    var total = 0L
    kept.foreach { case (p, c) => total += (if (charSet.contains(p)) c + 1L else c) }
    val logp = new java.util.HashMap[String, java.lang.Double](kept.length * 2)
    val lnTotal = math.log(total.toDouble)
    kept.foreach { case (p, c) =>
      val eff = if (charSet.contains(p)) c + 1L else c
      logp.put(p, java.lang.Double.valueOf(
        quantizeLogp(math.log(eff.toDouble) - lnTotal)))
    }
    (kept, logp)
  }

  /** Snap a log-probability onto the 2^-20 grid (floor). Grid
    * multiples up to |x| < 2^31·2^-20 are exactly representable
    * doubles, so every Viterbi DP sum of quantized log-probs is EXACT
    * arithmetic — identical in any evaluation order and any engine —
    * which makes the DP's `==` tie comparison well-defined across the
    * Spark kernel and the DuckDB oracle twin. A 1–2-ulp libm `log`
    * divergence between engines can only flip the floor when the true
    * value sits within ~2^-50 of a grid boundary (the same accepted
    * residual-risk class as the WAV oracle's `trunc(sin(...))`).
    */
  private[llm] def quantizeLogp(x: Double): Double = Grid.q20(x)

  /** Likelihood-loss pruning (the paper's criterion, Kudo &
    * Richardson 2018 §3.2) as an alternative to count-based pruning:
    * a multi-char piece's loss is `count · (logp(piece) −
    * altScore(piece))`, where altScore is the best segmentation of
    * the piece's own text WITHOUT the piece — i.e. how much corpus
    * log-likelihood is lost if its occurrences must re-segment. A
    * frequent piece whose characters are themselves cheap can rank
    * BELOW a rarer piece with no good alternative — exactly where
    * the two criteria diverge (differential-tested in UnigramSpec).
    *
    * Declared simplification vs the paper: the removal is scored
    * against the CURRENT distribution (no re-normalization of the
    * remaining masses, no EM re-fit between candidate removals) —
    * the standard one-shot approximation. Deterministic: altScore
    * sums grid-quantized log-probs (exact arithmetic), and the loss
    * compare `count · Δ` is exact for any corpus count below
    * 2^52 · 2^-20 / |Δ|; ties break on piece text ascending UTF-8.
    *
    * Driver-side and vocab-sized by construction (|vocab| DPs over
    * ≤ maxLen-cp strings) — corpus size never enters.
    */
  private[llm] def lossPrune(
      counts: collection.Map[String, Long],
      chars: Iterable[String],
      vocabSize: Int,
      logp: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): collection.Map[String, Long] = {
    val charArr = chars.toArray
    val charSet = charArr.toSet
    val multi = counts.iterator
      .filter { case (p, c) => c > 0L && !charSet.contains(p) }
      .toArray
    val slots = math.max(0, vocabSize - charArr.length)
    val keep: Array[(String, Long)] =
      if (vocabSize <= 0 || multi.length <= slots) multi
      else {
        def altScore(p: String): Double = {
          val own = logp.remove(p) // score the world without the piece
          try viterbi(p, logp, maxLen).foldLeft(0.0) { (s, q) =>
            val l = logp.get(q)
            s + (if (l == null) UnkLogp else l.doubleValue())
          } finally if (own != null) logp.put(p, own)
        }
        val scored = multi.map { case (p, c) =>
          val own = logp.get(p)
          val lp = if (own == null) UnkLogp else own.doubleValue()
          (p, c, c.toDouble * (lp - altScore(p)))
        }
        val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Bpe.utf8Ordering)
          .on[(String, Long, Double)] { case (p, _, l) => (l, p) }
        scored.sorted(ord).take(slots).map { case (p, c, _) => (p, c) }
      }
    (charArr.map(c0 => c0 -> counts.getOrElse(c0, 0L)) ++ keep).toMap
  }

  /** One E-step over an in-memory word list (driver path and the
    * per-partition distributed kernel share this accumulator).
    */
  private[llm] def accumulate(
      words: Iterator[(String, Long)],
      logp: java.util.HashMap[String, java.lang.Double],
      maxLen: Int,
      acc: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    words.foreach { case (w, f) =>
      viterbi(w, logp, maxLen).foreach { p =>
        val prev = acc.get(p)
        acc.put(p, java.lang.Long.valueOf(if (prev == null) f else prev.longValue() + f))
      }
    }
    acc
  }

  private def toScala(m: java.util.HashMap[String, java.lang.Long]): collection.Map[String, Long] = {
    val b = collection.mutable.HashMap.empty[String, Long]
    m.forEach((k, v) => b.put(k, v.longValue()))
    b
  }

  /** Distributed E-step: broadcast the piece log-probs, one map pass
    * over the word relation with per-partition partial counts, one
    * vocab-sized aggregate. The ONLY job of the round.
    */
  private def distributedEStep(
      wf: DataFrame,
      logp: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): collection.Map[String, Long] = {
    val spark = wf.sparkSession
    val bc = spark.sparkContext.broadcast(logp)
    val schema = StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("n", LongType, nullable = false)))
    val partials = wf.mapPartitions { it =>
      val acc = new java.util.HashMap[String, java.lang.Long]()
      accumulate(it.map(r => (r.getString(0), r.getLong(1))), bc.value, maxLen, acc)
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      acc.forEach((p, c) => out += Row(p, c.longValue()))
      out.iterator
    }(Encoders.row(schema))
    val rows = partials.groupBy("piece").agg(sum("n").as("n")).collect()
    bc.destroy() // one piece table per round — don't pin old rounds
    val b = collection.mutable.HashMap.empty[String, Long]
    rows.foreach(r => b.put(r.getString(0), r.getLong(1)))
    b
  }

  /** Train a unigram piece table. Returns one row per kept piece:
    * (rank, piece, n, logprob) — rank 1-based by (count desc, piece
    * asc UTF-8), `n` the final-round Viterbi count, `logprob` the
    * smoothed log-probability actually used for encoding.
    */
  def train(
      docs: DataFrame,
      textCol: Column,
      vocabSize: Int,
      seedSize: Int = 2000,
      emIters: Int = 2,
      maxPieceLen: Int = 8,
      minFreq: Long = 1L,
      topV: Int = 0,
      pruneBy: String = "count"): DataFrame = {
    require(pruneBy == "count" || pruneBy == "loss",
      s"pruneBy must be 'count' or 'loss', got '$pruneBy'")
    val spark = docs.sparkSession
    val wf = wordFreq(docs, textCol, minFreq, topV).truncateLineage(eager = false)
    // seed: one aggregate over the in-row substring expansion, consumed
    // twice (chars + top multi) — vocab-sized, so collect both slices
    val seedCounts = wf
      .select(explode(substringPieces(col("w"), maxPieceLen)).as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("n"))
      .truncateLineage(eager = false)
    val chars = seedCounts.where(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val multis = seedCounts.where(length(col("piece")) > 1)
      .orderBy(col("n").desc, col("piece").asc).limit(seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val charKeys = chars.map(_._1)
    var (kept, logp) = mstep(
      (chars ++ multis).toMap, charKeys, vocabSize = 0)

    val localMax = spark.conf.getOption(LocalVocabThresholdKey)
      .map(_.toLong).getOrElse(1000000L)
    val useDriver = localMax > 0 && wf.count() <= localMax
    val localWords: Array[(String, Long)] =
      if (useDriver) wf.collect().map(r => (r.getString(0), r.getLong(1)))
      else Array.empty

    def eStep(): collection.Map[String, Long] =
      if (useDriver)
        toScala(accumulate(localWords.iterator, logp, maxPieceLen,
          new java.util.HashMap[String, java.lang.Long]()))
      else distributedEStep(wf, logp, maxPieceLen)

    for (_ <- 1 to emIters) {
      val counts = eStep()
      val r = mstep(counts, charKeys, vocabSize = 0)
      kept = r._1; logp = r._2
    }
    // prune to the target vocabulary (only the pruned log-probs feed
    // the final pass), then one final round so the reported counts/
    // log-probs describe the SHIPPED piece table. pruneBy selects the
    // criterion: "count" keeps the top multis by EM count (what the
    // DuckDB twin replays); "loss" keeps them by likelihood loss
    // ([[lossPrune]] — the paper's ranking). The final M-step's count
    // truncation below is then a no-op either way (final counts only
    // cover pieces already inside the pruned vocabulary).
    logp =
      if (pruneBy == "loss")
        mstep(lossPrune(kept.toMap, charKeys, vocabSize, logp, maxPieceLen),
          charKeys, vocabSize = 0)._2
      else mstep(kept.toMap, charKeys, vocabSize)._2
    val fin = mstep(eStep(), charKeys, vocabSize)
    kept = fin._1; logp = fin._2

    import spark.implicits._
    val lp = logp
    kept.zipWithIndex.toSeq
      .map { case ((p, c), i) => (i + 1L, p, c, lp.get(p).doubleValue()) }
      .toDF("rank", "piece", "n", "logprob")
  }

  /** Encode a corpus with a trained piece table: map-only Viterbi
    * segmentation per word (per-partition distinct-word memo — Zipf
    * makes the hit rate ≈ 1 on natural text), the table shipped once
    * per task in the closure. Returns (doc_id, n_pieces, pieces_str).
    */
  def encode(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      pieces: Seq[(String, Double)],
      maxPieceLen: Int): DataFrame = {
    val pre = graft.Tuning.spreadTinyInput(
      docs.select(idCol.as("doc_id"), textCol.as("__text")))
    val idField = pre.schema.head
    val outSchema = StructType(Seq(
      StructField("doc_id", idField.dataType, idField.nullable),
      StructField("n_pieces", LongType, nullable = true),
      StructField("pieces_str", StringType, nullable = true)))
    val tbl = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, l) => tbl.put(p, java.lang.Double.valueOf(l)) }
    val MemoCap = 1 << 20
    pre.mapPartitions { it =>
      val memo = new java.util.HashMap[String, Array[String]]()
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
              var seg = memo.get(w)
              if (seg == null) {
                seg = viterbi(w, tbl, maxPieceLen)
                if (memo.size < MemoCap) memo.put(w, seg)
              }
              n += seg.length
              var j = 0
              while (j < seg.length) {
                if (!first) sb.append(' ')
                sb.append(seg(j))
                first = false
                j += 1
              }
            }
            i += 1
          }
          Row(id, n, sb.toString)
        }
      }
    }(Encoders.row(outSchema))
  }
}
