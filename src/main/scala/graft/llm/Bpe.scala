package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  private[llm] val utf8Ordering: Ordering[String] = new Ordering[String] {
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
    */
  private def adjacentPairs(symbols: Column): Column = {
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

  def train(
      docs: DataFrame,
      textCol: Column,
      merges: Int): DataFrame = {
    val spark = docs.sparkSession
    // pass 1 (the ONLY corpus pass): word-frequency table
    var wf = docs
      .select(explode(split(trim(textCol), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(charSymbols(col("w")).as("sym"), col("freq"))
      .truncateLineage()
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
      for (step <- 1 to merges) {
        val top = wf
          .select(explode(adjacentPairs(col("sym"))).as("pair"), col("freq"))
          .groupBy("pair").agg(sum("freq").as("n"))
          .orderBy(col("n").desc, col("pair").asc)
          .limit(1)
          .collect()
        if (top.nonEmpty) {
          val pair = top(0).getString(0)
          val n = top(0).getLong(1)
          val Array(l, r) = pair.split(" ", 2)
          learned += ((step, l, r, l + r, n))
          wf = wf
            .select(applyMerge(col("sym"), lit(l), lit(r)).as("sym"), col("freq"))
            .truncateLineage()
        }
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("step", "lhs", "rhs", "merged", "n")
      .select(col("step").cast("long").as("step"), col("lhs"), col("rhs"),
        col("merged"), col("n"))
  }

  /** Tokenize with a learned merge list: apply each rule in order to
    * every word — map-only over the corpus, the serving-side pair of
    * [[train]]. Returns (id, n_tokens, tokens_str): token count and
    * the space-joined token stream per document.
    */
  def encode(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      rules: Seq[(String, String)]): DataFrame = {
    val words = docs.select(idCol.as("doc_id"),
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
}
