package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Lineage.TruncateOps

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting. All pure column expressions
  * (whole-stage-codegen'd, no UDFs) so they fuse into the document
  * scan — at 100 TB these run as a single map-only pass.
  */
object TextStats {

  /** Stopword tables for the n-gram/stopword language heuristic. */
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was", "for"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un", "una", "es"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"))

  def words(text: Column): Column = split(trim(text), "\\s+")

  def wordCount(text: Column): Column = size(words(text))

  /** Whitespace token count (the cheap tokenizer). */
  def tokensWhitespace(text: Column): Column = wordCount(text)

  /** BPE-ish token estimate: count of maximal runs of word chars,
    * digits, or single punctuation — a regex proxy for subword
    * tokenizers (deterministic, portable).
    */
  def tokensBpeish(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Per-language stopword hit count. */
  def stopwordHits(text: Column, lang: String): Column = {
    val sw = stopwords(lang)
    val ws = words(lower(text))
    size(filter(ws, w => sw.map(s => w === s).reduce(_ || _)))
  }

  /** Language ID by argmax stopword-hit-rate over the known tables;
    * documents with no hits anywhere get "und" (undetermined).
    */
  def langId(text: Column): Column =
    graft.functions.TextKernels.langId(text, stopwords)

  /** The original Column composition, kept as the parity reference
    * for the native kernel (`LangIdSpec`).
    */
  private[llm] def langIdReference(text: Column): Column = {
    val scored = stopwords.keys.toSeq.sorted.map(l => (l, stopwordHits(text, l)))
    val best = scored.map { case (l, s) =>
      struct(s.as("hits"), lit(l).as("lang"))
    }.reduce((a, b) => when(b.getField("hits") > a.getField("hits"), b).otherwise(a))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality features: word count, mean word length, alpha ratio,
    * punctuation ratio, stopword ratio (against the union table) —
    * the standard pre-training quality-filter signals.
    */
  def qualityFeatures(text: Column): Seq[Column] = {
    val n = wordCount(text).cast("double")
    val chars = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?'\"()]", "")).cast("double")
    val allStops = stopwords.values.flatten.toSeq.distinct
    val stopHits = size(filter(words(lower(text)),
      w => allStops.map(s => w === s).reduce(_ || _))).cast("double")
    Seq(
      n.cast("long").as("n_words"),
      round(chars / greatest(n, lit(1.0)), 4).as("mean_word_len"),
      round(alpha / greatest(chars, lit(1.0)), 4).as("alpha_ratio"),
      round(punct / greatest(chars, lit(1.0)), 4).as("punct_ratio"),
      round(stopHits / greatest(n, lit(1.0)), 4).as("stopword_ratio"))
  }

  /** Composite quality score in [0,1]: weighted blend of the feature
    * signals (length-normalized, alpha-heavy) — a deterministic
    * stand-in for a learned filter.
    */
  def qualityScore(text: Column): Column = round(qualityScoreRaw(text), 4)

  /** Unrounded score — use this for threshold comparisons (filtering
    * on a display-rounded value misclassifies boundary docs).
    */
  def qualityScoreRaw(text: Column): Column = {
    val n = wordCount(text).cast("double")
    val chars = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double")
    val lenScore = least(n / lit(64.0), lit(1.0))
    val alphaScore = alpha / greatest(chars, lit(1.0))
    lit(0.5) * lenScore + lit(0.5) * alphaScore
  }

  // ------------------------------------------------------------------
  // Within-document repetition (Gopher-style repetition filters)
  // ------------------------------------------------------------------
  // All pure higher-order column expressions over per-document arrays:
  // O(segments²) worst case per document, zero shuffles, fused into
  // the scan — the per-doc arrays are bounded by document length, so
  // at 100 TB this stays a map-only pass like the other TextStats.

  /** Non-empty trimmed lines of the document. */
  def docLines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  /** All four repetition signals from ONE pass over the document —
    * the native kernel ([[graft.functions.RepetitionMetrics]]); the
    * individual Column forms below are kept as the parity reference
    * (`RepetitionSpec` pins bit-equality).
    */
  def repetitionMetrics(text: Column): Column =
    graft.functions.RepetitionMetrics.column(text)

  /** Fraction of lines that are repeats of an earlier line
    * (1 − distinct/total); 0 for empty documents.
    */
  def dupLineRatio(text: Column): Column = {
    val ls = docLines(text)
    when(size(ls) > 0,
      round(lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls).cast("double"), 6))
      .otherwise(lit(0.0))
  }

  /** Fraction of line characters inside lines that occur more than
    * once (every occurrence counts, the Gopher duplicate-line-chars
    * signal); 0 when the document has no line characters.
    *
    * Single sorted fold — never close over another array expression
    * inside a lambda body: interpreted higher-order functions
    * re-evaluate the whole captured subtree per element, turning a
    * per-document O(L) pass into O(L²·split) (measured: minutes per
    * small corpus before this shape).
    */
  def dupLineCharRatio(text: Column): Column = {
    val ls = docLines(text)
    val tot = aggregate(ls, lit(0L), (acc, l) => acc + length(l).cast("long"))
    // fold over the sorted lines: a run's 2nd member charges both
    // copies (the 1st retroactively), members beyond charge themselves
    val dup = aggregate(
      array_sort(ls),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0L).as("dup")),
      (acc, l) => {
        val run = when(l === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        val add = when(run === 2, length(l).cast("long") * 2)
          .when(run > 2, length(l).cast("long"))
          .otherwise(lit(0L))
        struct(l.as("prev"), run.as("run"), (acc.getField("dup") + add).as("dup"))
      },
      acc => acc.getField("dup"))
    when(tot > 0, round(dup.cast("double") / tot.cast("double"), 6)).otherwise(lit(0.0))
  }

  private def wordNgrams(ws: Column, n: Int): Column = {
    val len = greatest(size(ws) - lit(n - 1), lit(0))
    (2 to n).foldLeft(slice(ws, lit(1), len)) { (acc, i) =>
      zip_with(acc, slice(ws, lit(i), len), (a, b) => concat(a, lit(" "), b))
    }
  }

  /** Fraction of word characters covered by the single most frequent
    * word bigram (count × bigram chars / total word chars) — the
    * Gopher top-2-gram signal. Ties break on the lexicographically
    * smallest gram for deterministic output.
    *
    * Single sorted fold (run-length max over the sorted bigram list);
    * ascending order makes the FIRST run reaching the max the
    * lexicographically smallest gram, which is the tie-break. See
    * [[dupLineCharRatio]] for why no lambda closes over `bg`.
    */
  def topBigramCharRatio(text: Column): Column = {
    val ws = words(text)
    val bg = wordNgrams(ws, 2)
    val best = aggregate(
      array_sort(bg),
      struct(lit("").as("prev"), lit(0).as("run"),
        lit(0).as("bcnt"), lit("").as("bgram")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        val better = run > acc.getField("bcnt")
        struct(g.as("prev"), run.as("run"),
          when(better, run).otherwise(acc.getField("bcnt")).as("bcnt"),
          when(better, g).otherwise(acc.getField("bgram")).as("bgram"))
      })
    val wordChars = aggregate(ws, lit(0L), (acc, w) => acc + length(w).cast("long"))
    when(size(bg) > 0 && wordChars > 0,
      round(best.getField("bcnt").cast("double") *
        length(regexp_replace(best.getField("bgram"), " ", "")).cast("double")
        / wordChars.cast("double"), 6))
      .otherwise(lit(0.0))
  }

  /** Fraction of word trigram instances that are repeats
    * (1 − distinct/total trigrams); 0 below three words.
    */
  def dupTrigramRatio(text: Column): Column = {
    val tg = wordNgrams(words(text), 3)
    when(size(tg) > 0,
      round(lit(1.0) - size(array_distinct(tg)).cast("double") / size(tg).cast("double"), 6))
      .otherwise(lit(0.0))
  }

  // ------------------------------------------------------------------
  // PII scrubbing (curation-pipeline redaction pass)
  // ------------------------------------------------------------------
  // RE2-compatible patterns (no backrefs/lookaround) so the exact
  // same regexes run under Java regex here and RE2-based engines in
  // oracles/ports; applied email → IPv4 → phone, most-specific first.

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private val PhoneRe = "\\+[0-9][0-9 ().-]{6,}[0-9]"

  /** Redact emails, IPv4 addresses, and international-format phone
    * numbers with typed placeholders — one fused `regexp_replace`
    * chain inside the scan.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** (n_emails, n_ips, n_phones) found by the same patterns. */
  def piiCounts(text: Column): Seq[Column] = Seq(
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
    size(regexp_extract_all(regexp_replace(text, EmailRe, "<EMAIL>"), lit(Ipv4Re), lit(0)))
      .cast("long").as("n_ips"),
    size(regexp_extract_all(
      regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"),
      lit(PhoneRe), lit(0))).cast("long").as("n_phones"))

  // ------------------------------------------------------------------
  // C4-style heuristic document filters
  // ------------------------------------------------------------------
  // The classic web-corpus cleanup battery (C4, Raffel et al. 2020
  // §2.2, plus two Gopher line rules): per-line terminal punctuation,
  // bullet starts, ellipsis ends, the lorem-ipsum and curly-brace
  // document drops, and a words-per-line floor. All pure column math
  // over the per-document line array — fused into the scan, map-only
  // at any scale, like the rest of TextStats.

  /** Fraction of lines satisfying `pred` (0 for empty docs). */
  private def lineRatio(lines: Column, pred: Column => Column): Column =
    size(filter(lines, pred)).cast("double") /
      greatest(size(lines).cast("double"), lit(1.0))

  /** The unrounded C4 signals, in order: n_lines, terminal-punct line
    * ratio, bullet-start line ratio, ellipsis-end line ratio,
    * ≥5-word line ratio, has-lorem-ipsum, has-curly-brace.
    */
  private def c4Raw(text: Column): (Column, Column, Column, Column, Column, Column, Column) = {
    val lines = docLines(text)
    (size(lines).cast("long"),
      lineRatio(lines, l => l.rlike("[.!?\"]$")),
      lineRatio(lines, l => l.rlike("^[-*•]")),
      lineRatio(lines, l => l.endsWith("...")),
      lineRatio(lines, l => size(split(l, "\\s+")) >= 5),
      lower(text).contains("lorem ipsum").cast("long"),
      text.contains("{").cast("long"))
  }

  /** The C4 filter signals as named display columns (ratios rounded
    * for stable cross-engine output).
    */
  def c4Signals(text: Column): Seq[Column] = {
    val (nLines, term, bullet, ellipsis, longLine, lorem, brace) = c4Raw(text)
    Seq(
      nLines.as("n_lines"),
      round(term, 4).as("term_punct_ratio"),
      round(bullet, 4).as("bullet_ratio"),
      round(ellipsis, 4).as("ellipsis_ratio"),
      round(longLine, 4).as("long_line_ratio"),
      lorem.as("has_lorem"),
      brace.as("has_brace"))
  }

  /** Composite keep decision over the RAW signals (thresholding a
    * display-rounded ratio misclassifies boundary docs): drop
    * lorem-ipsum and code-bearing docs, demand a minimum terminal-
    * punctuation line ratio and word count. Thresholds are the
    * C4/Gopher defaults scaled to short synthetic docs.
    */
  def c4Keep(
      text: Column,
      minTermPunct: Double = 0.25,
      minWords: Int = 10): Column = {
    val (_, term, _, _, _, lorem, brace) = c4Raw(text)
    (lorem === 0) && (brace === 0) &&
      (term >= lit(minTermPunct)) && (wordCount(text) >= minWords)
  }

  // ------------------------------------------------------------------
  // BM25 / TF-IDF retrieval scoring
  // ------------------------------------------------------------------
  // Okapi BM25 of every document against a fixed query term set — the
  // standard retrieval-quality signal a curation pipeline uses to
  // rank corpus documents against a target-domain query. Fully
  // distributed: document frequencies come from ONE hash aggregate
  // over an exploded (term ∈ query only) relation, the tiny
  // (n_terms + 1)-row statistics relation broadcasts back, and the
  // score is an ordered fold over the literal query-term array inside
  // the scan — engine-portable float math, no driver loop.

  /** Per-document BM25 against `queryTerms` (matched on lowercased
    * whitespace tokens). Returns (id, dl, score columns appended).
    * `idf` uses the standard Robertson–Sparck Jones form
    * `ln(1 + (N - df + 0.5) / (df + 0.5))`.
    */
  def bm25(
      docs: DataFrame,
      queryTerms: Seq[String],
      textCol: Column,
      idCol: Column,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase).distinct.sorted
    val termArr = array(terms.map(lit): _*)
    val ws = words(lower(textCol))
    // corpus statistics: per-term document frequency + (N, avgdl) —
    // one exploded pass filtered to the query terms, one aggregate;
    // the result is query-term-sized and broadcasts
    val matched = docs.select(
      idCol.as("__id"), size(ws).cast("double").as("__dl"),
      filter(array_distinct(ws), w => array_contains(termArr, w)).as("__hits"))
    val stats = matched
      .select(col("__dl"), explode(concat(array(lit("")), col("__hits"))).as("__t"))
      .groupBy("__t")
      .agg(count(lit(1)).cast("double").as("__df"), sum("__dl").as("__sdl"))
    // the "" sentinel row carries N and Σdl (every doc contributes it)
    val global = stats.where(col("__t") === "")
      .select(col("__df").as("__n"), (col("__sdl") / col("__df")).as("__avgdl"))
    val dfMap = stats.where(col("__t") =!= "")
      .groupBy().agg(map_from_arrays(
        collect_list(col("__t")), collect_list(col("__df"))).as("__dfs"))
    // score: ordered fold over the sorted literal term list — tf is an
    // in-row count over the MATERIALIZED token column (`__ws` is an
    // attribute reference inside the lambdas, not a recompute — the
    // round-6 HOF discipline), idf a broadcast-map lookup;
    // deterministic float association for the oracle twin
    val withStats = docs
      .crossJoin(broadcast(global))
      .crossJoin(broadcast(dfMap))
      .withColumn("__ws", words(lower(textCol)))
    val dl = size(col("__ws")).cast("double")
    val score = aggregate(
      termArr, lit(0.0), (acc, t) => {
        val tf = size(filter(col("__ws"), w => w === t)).cast("double")
        val df0 = coalesce(element_at(col("__dfs"), t), lit(0.0))
        val idf = log(lit(1.0) + (col("__n") - df0 + lit(0.5)) / (df0 + lit(0.5)))
        val denom = tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / col("__avgdl"))
        acc + when(tf > 0.0, idf * tf * lit(k1 + 1.0) / denom).otherwise(lit(0.0))
      })
    withStats.select(
      idCol.as("doc_id"),
      dl.cast("long").as("dl"),
      round(score, 4).as("bm25"))
  }

  /** One-scan BM25 keyword top-k retrieval — the keyword side of
    * hybrid search, and the scale-correct generalization of [[bm25]]
    * (which scores ONE literal term set per corpus pass): every
    * query in the broadcast-bounded batch retrieves its top-k docs
    * through a single token equi-join against the exploded corpus —
    * no per-query scan, no literal term lists, queries are ROWS.
    *
    * Scale shape: corpus explodes once into a (doc, token, tf)
    * relation; df/N/avgdl are one aggregate each (dl sums are exact
    * integer doubles, so avgdl is order-free); query terms join on
    * token, doc length joins on doc_id — all hash equi-joins with
    * map-side partials, nothing pairs the corpus with itself.
    *
    * Determinism: each (query, doc, term) BM25 contribution is
    * floored to the 2^-20 grid BEFORE the per-pair sum — exact grid
    * values sum exactly in any order (the `m_img_entropy` device), so
    * the score, and therefore the (score desc, doc_id asc) ranking,
    * is bit-identical on any partitioning and on the DuckDB twin.
    * Self-matches are excluded. Returns (query_id, rank, doc_id,
    * score).
    */
  def keywordTopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      textCol: Column = col("text"),
      idCol: Column = col("doc_id"),
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    // null texts are out of the corpus entirely (N, avgdl, candidates)
    // — Spark's size(null) and SQL's null-skipping aggregate would
    // otherwise diverge the moment the fixtures grow a null
    val base = docs.where(textCol.isNotNull)
    val toks = base
      .select(idCol.cast("long").as("doc_id"),
        explode(words(lower(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dls = base.select(idCol.cast("long").as("doc_id"),
      size(words(lower(textCol))).cast("double").as("dl"))
    val stats = toks.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
    val global = dls.agg(count(lit(1)).cast("double").as("n"),
      (sum("dl") / count(lit(1))).as("avgdl"))
    val qt = queries.where(textCol.isNotNull)
      .select(idCol.cast("long").as("query_id"),
        explode(array_distinct(words(lower(textCol)))).as("token"))
      .where(col("token") =!= "")
    val joined = qt.join(toks, Seq("token"))
      .where(col("query_id") =!= col("doc_id"))
      .join(stats, Seq("token"))
      .join(dls, Seq("doc_id"))
      .crossJoin(broadcast(global))
    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val scores = joined
      .select(col("query_id"), col("doc_id"),
        (floor(contrib * lit(1048576.0)) / lit(1048576.0)).as("c"))
      .groupBy("query_id", "doc_id")
      .agg(sum("c").as("score"))
    // k-bounded aggregate, not a per-query rank window: a stop-wordy
    // query's candidate set approaches the corpus, and the window
    // form would sort it inside one task
    graft.functions.BoundedTopK.topK(scores, Seq("query_id"),
        struct(col("score"), col("doc_id")), k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("__item.doc_id").as("doc_id"),
        round(col("__item.score"), 4).as("score"))
  }

  /** Class-based TF-IDF cluster labeling (the BERTopic c-TF-IDF,
    * Grootendorst 2022): treat each cluster as ONE pseudo-document
    * and rank its terms by `ctf(t, c) · ln(1 + A / f_t)` where ctf is
    * the term's count inside the cluster, f_t its corpus count, and
    * A the average token count per cluster — the standard way to
    * turn embedding clusters back into human-readable topics at
    * corpus scale. Pairs with [[graft.llm.Similarity.kmeansTrain]]
    * assignments for a fully hash-gated train → assign → label
    * pipeline (`d_cluster_terms`). Both f_t and A are computed over
    * the ASSIGNED tokens — Grootendorst defines f_t across the
    * classes, and mixing universes (corpus-wide f_t vs assigned-only
    * A) would skew rankings whenever assignments cover a subset.
    *
    * Scale shape: one corpus explode, a doc_id equi-join onto the
    * assignment relation (lineage-cut — three aggregates read it),
    * then (cluster, term) / (term) hash aggregates — all-integer
    * counts, map-side partials, nothing corpus². Scores floor onto
    * the 2^-20 grid (the ln's 1-ulp engine divergence can only flip
    * a floor at a ~2^-50 boundary — the accepted residual class).
    * Ties rank to the lexicographically smallest term. Returns
    * (centroid_id, rank, token, score).
    */
  def clusterTerms(
      docs: DataFrame,
      assignments: DataFrame,
      topK: Int,
      textCol: Column = col("text"),
      idCol: Column = col("doc_id")): DataFrame = {
    val toks = docs.where(textCol.isNotNull)
      .select(idCol.cast("long").as("doc_id"),
        explode(words(lower(textCol))).as("token"))
      .where(col("token") =!= "")
    val asg = assignments.select(col("doc_id").cast("long").as("doc_id"),
      col("centroid_id").cast("long").as("centroid_id"))
    // three aggregates (ctf, ft, A) read this relation — cut the
    // lineage so the explode and the assignment job run ONCE
    val joined = toks.join(asg, Seq("doc_id")).truncateLineage(eager = false)
    val ctf = joined.groupBy("centroid_id", "token")
      .agg(count(lit(1)).cast("double").as("ctf"))
    val ft = joined.groupBy("token").agg(count(lit(1)).cast("double").as("ft"))
    // A = assigned tokens / clusters — exact integer counts, one row
    val global = joined.agg(
      (count(lit(1)).cast("double") /
        countDistinct(col("centroid_id")).cast("double")).as("a"))
    val score = floor(col("ctf") * log(lit(1.0) + col("a") / col("ft")) *
      lit(1048576.0)) / lit(1048576.0)
    val scored = ctf.join(ft, Seq("token")).crossJoin(broadcast(global))
      .select(col("centroid_id"), col("token"), score.as("score"))
    val w = Window.partitionBy("centroid_id")
      .orderBy(col("score").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("centroid_id"), col("rank"), col("token"),
        round(col("score"), 4).as("score"))
  }

  /** Signed feature hashing (Weinberger et al. 2009, "the hashing
    * trick") — model-free text vectors: every token hashes to a
    * bucket in [0, dim) with a ±1 sign from an independent hash, and
    * a document's vector is the signed bucket counts. No vocabulary,
    * no training, no broadcast — the classic way to get geometry over
    * text at corpus scale when no embedding model is in the loop
    * (cheap near-dup candidate vectors, linear classifiers, drift
    * monitors). Both hashes are the repo's engine-portable md5
    * family, so the vectors are bit-identical on any engine.
    *
    * Values stay INTEGER (signed counts) — every downstream sum
    * (dots, squared norms) is exact in any order, which is what puts
    * [[hashedKnn]]'s full ranking under the hash oracle with no
    * quantization device at all. Sparse output: (doc_id, pos, v),
    * only touched buckets appear; null/empty texts produce no rows.
    * One explode + one hash aggregate — map-side partials, no joins.
    */
  def hashedVectors(
      docs: DataFrame,
      dim: Int,
      textCol: Column = col("text"),
      idCol: Column = col("doc_id")): DataFrame = {
    val tok = explode(words(lower(textCol)))
    val base = docs.where(textCol.isNotNull)
      .select(idCol.cast("long").as("doc_id"), tok.as("token"))
      .where(col("token") =!= "")
    base
      .select(col("doc_id"),
        (Sampling.hashBits60(concat(col("token"), lit("|hepos"))) % dim).as("pos"),
        when(Sampling.hashBits60(concat(col("token"), lit("|hesign"))) % 2 === 0,
          lit(1L)).otherwise(lit(-1L)).as("s"))
      .groupBy("doc_id", "pos")
      .agg(sum("s").as("v"))
      .where(col("v") =!= 0) // cancelled buckets leave the sparse form
  }

  /** Text-only cosine kNN over [[hashedVectors]] — retrieval with no
    * embedding model anywhere: the sparse signed-count vectors score
    * through a bucket equi-join (the inverted-index shape, like
    * [[keywordTopK]]), dot products and squared norms are exact
    * integer sums, and the cosine is one deterministic division — the
    * entire ranking hash-matches across engines without any grid.
    * Queries are a broadcast-bounded batch.
    *
    * Returned neighbors are the top-k among POSITIVELY-similar docs
    * (dot > 0) — with signed hashing a bucket-sharing doc can score
    * negative, and a doc sharing no bucket scores exactly 0, so a
    * sim ≤ 0 cutoff is what makes the bucket join a sound pruning:
    * everything it skips scores ≤ 0 < every returned row. (Without
    * the cutoff, rank-k could fall to a zero-overlap doc the join
    * never sees.) Fewer than k positive candidates → a short result,
    * deterministically. Ties rank to the lowest doc id; self-matches
    * are excluded. Returns (query_id, rank, doc_id, sim).
    */
  def hashedKnn(
      docs: DataFrame,
      queries: DataFrame,
      dim: Int,
      k: Int,
      textCol: Column = col("text"),
      idCol: Column = col("doc_id")): DataFrame = {
    val dv = hashedVectors(docs, dim, textCol, idCol)
    val qv = hashedVectors(queries, dim, textCol, idCol)
      .select(col("doc_id").as("query_id"), col("pos"), col("v").as("qv"))
    val norms = dv.groupBy("doc_id").agg(sum(col("v") * col("v")).as("n2"))
    val qnorms = qv.groupBy("query_id").agg(sum(col("qv") * col("qv")).as("qn2"))
    val dots = dv.join(qv, Seq("pos"))
      .where(col("query_id") =!= col("doc_id"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("v") * col("qv")).as("dot"))
      .where(col("dot") > 0) // the pruning-soundness cutoff (docstring)
    val scored = dots
      .join(norms, Seq("doc_id"))
      .join(qnorms, Seq("query_id"))
      .withColumn("sim",
        col("dot").cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("qn2").cast("double"))))
    graft.functions.BoundedTopK.topK(scored, Seq("query_id"),
        struct(col("sim"), col("doc_id")), k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("__item.doc_id").as("doc_id"),
        round(col("__item.sim"), 4).as("sim"))
  }

  /** Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 §A1.1) —
    * the hard-threshold filter family, complementary to the blended
    * [[qualityScore]]: word-count window, mean word length window,
    * symbol-to-word ratio (#/ellipsis), bullet-start and
    * ellipsis-end line fractions, alphabetic-word fraction, and a
    * required-stopword presence count. Returns the signal columns
    * plus the `keep` decision; thresholds are the paper's. All
    * in-row column expressions — a map-only pass at any scale.
    * Comparisons run on the RAW ratios (filtering on display-rounded
    * values misclassifies boundary docs, the [[qualityScoreRaw]]
    * lesson).
    */
  def gopherSignals(text: Column): Seq[Column] = {
    val ws = words(text)
    val n = size(ws).cast("double")
    val lines0 = filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")
    val nLines = greatest(size(lines0), lit(1)).cast("double")
    val meanLen = length(regexp_replace(text, "\\s", "")).cast("double") /
      greatest(n, lit(1.0))
    val symbols = (length(text) -
      length(regexp_replace(text, "#|\\.\\.\\.|…", ""))).cast("double")
    val bulletFrac = size(filter(lines0,
      l => l.rlike("^[•\\-\\*]"))).cast("double") / nLines
    val ellipsisFrac = size(filter(lines0,
      l => l.rlike("(\\.\\.\\.|…)$"))).cast("double") / nLines
    val alphaFrac = size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") /
      greatest(n, lit(1.0))
    val required = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    // one-pass distinct-presence count: array_intersect dedups, and
    // the tokenization is NOT inside a lambda (a per-stopword
    // array_contains would re-split the document 8× — the HOF
    // discipline)
    val stopHits = size(array_intersect(
      array(required.map(lit): _*), words(lower(text))))
    Seq(n.cast("long").as("n_words"), meanLen.as("mean_word_len"),
      (symbols / greatest(n, lit(1.0))).as("symbol_ratio"),
      bulletFrac.as("bullet_line_ratio"),
      ellipsisFrac.as("ellipsis_line_ratio"),
      alphaFrac.as("alpha_word_ratio"),
      stopHits.cast("long").as("stop_hits"))
  }

  /** The Gopher keep decision over [[gopherSignals]] (same column
    * order): thresholds from the paper — 50 ≤ words ≤ 100 000, mean
    * word length in [3, 10], symbol ratio ≤ 0.1, ≤ 90% bullet lines,
    * ≤ 30% ellipsis lines, ≥ 80% alphabetic words, ≥ 2 required
    * stopwords.
    */
  def gopherKeep(text: Column): Column = gopherKeep(gopherSignals(text))

  /** [[gopherKeep]] over already-built signals — callers that also
    * project the signals pass them here so the seven regex passes run
    * once per row, not twice.
    */
  def gopherKeep(signals: Seq[Column]): Column = {
    val Seq(n, meanLen, symbol, bullet, ellipsis, alpha, stops) = signals
    (n >= 50L) && (n <= 100000L) &&
      (meanLen >= 3.0) && (meanLen <= 10.0) &&
      (symbol <= 0.1) && (bullet <= 0.9) && (ellipsis <= 0.3) &&
      (alpha >= 0.8) && (stops >= 2L)
  }

  /** Unigram-LM cross-entropy scoring — the KenLM-free perplexity
    * proxy for quality filtering: the corpus itself is the language
    * model (`P(w) = count(w) / total`), each document scores its mean
    * token negative log-likelihood (nats) and its perplexity
    * `exp(nll)`. Boilerplate scores low, rare-token noise scores
    * high; filter on either tail.
    *
    * Scale shape: two partial-agg counts (per-(doc,token) tf and the
    * vocab table) + ONE equi-join on token (vocab side is 1 row per
    * type; AQE handles hot stop-word keys) + one per-doc aggregate.
    * No broadcast of the vocab is assumed — at corpus scale it can be
    * billions of types. Float discipline: per-token contributions are
    * summed by an ordered fold over the token-sorted list (documents
    * hold few distinct types), and `ln` results round to 4 dp at the
    * end — `ln` is not correctly-rounded IEEE across engines.
    */
  def unigramLogLoss(
      docs: DataFrame, text: Column, idCol: Column): DataFrame = {
    val toks = docs.select(idCol.as("doc_id"), explode(words(text)).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // NOT derived from tf (`n = Σ tf` over the (doc, token) aggregate
    // would make the explode run once via exchange reuse): measured
    // 1.15–1.21× SLOWER at sf0.1 — chaining vocab behind tf's
    // exchange serializes two shuffles where the two independent
    // explode→aggregate pipelines overlap, and the (doc, token) grain
    // is a worse map-side-combine key than the bare token (round-17
    // A/B, kept as the parallel two-pass shape)
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("n"))
    val total = vocab.groupBy().agg(sum(col("n")).as("__total"))
    val contrib = tf.join(vocab, "token")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("token"), col("tf"),
        (col("tf") * -log(col("n").cast("double") / col("__total"))).as("c"))
    val folded = contrib.groupBy("doc_id").agg(
      sum(col("tf")).as("dl"),
      aggregate(
        array_sort(collect_list(struct(col("token"), col("c")))),
        lit(0.0), (acc, s) => acc + s.getField("c")).as("__nats"))
    folded.select(col("doc_id"), col("dl"),
      round(col("__nats") / col("dl"), 4).as("nll"),
      round(exp(col("__nats") / col("dl")), 4).as("ppl"))
  }

  /** Bigram-LM scoring with Stupid Backoff (Brants et al. 2007,
    * "Large Language Models in Machine Translation"): documents score
    * against an LM built from a TRAIN relation (typically a corpus
    * split), so unseen bigrams genuinely take the backoff path —
    * `S(w₂|w₁) = n(w₁w₂)/n(w₁)` when the bigram was seen, else
    * `0.4 · (n(w₂)+1)/(total+|V|)` (the paper's α with an add-one
    * smoothed unigram, declared divergence so held-out tokens never
    * hit ln 0). Per doc: mean −ln S over its n−1 bigram positions
    * (docs under two tokens drop) plus the perplexity.
    *
    * Scale shape: bigram extraction is in-row (one sequence-transform
    * over the materialized token array); the LM tables are two
    * partial-agg counts; scoring is THREE shuffled equi-joins (bigram,
    * left-context unigram, backoff unigram) — no LM broadcast (bigram
    * types outnumber documents at corpus scale); the two scalar
    * totals ride a 1-row broadcast. Contributions fold in position
    * order; `ln` rounds to 4 dp at the end.
    */
  /** (doc_id, pos, w1, w2) bigram positions — in-row extraction (one
    * sequence-transform over the token array), shared by the Stupid
    * Backoff and Kneser–Ney scorers.
    */
  private def bigramPositions(df: DataFrame, text: Column, idCol: Column): DataFrame =
    df.select(idCol.as("doc_id"), words(text).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => struct(i.as("pos"), element_at(col("toks"), i).as("w1"),
          element_at(col("toks"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.pos").as("pos"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Per-doc (dl, nll, ppl) from (doc_id, pos, c) contribution rows —
    * position-ordered fold for float identity, shared tail of both
    * bigram scorers.
    */
  private def foldLogLoss(contrib: DataFrame): DataFrame =
    contrib.groupBy("doc_id").agg(
        count(lit(1)).as("dl"),
        aggregate(
          transform(
            array_sort(collect_list(struct(col("pos"), col("c")))),
            e => e.getField("c")),
          lit(0.0), (acc, v) => acc + v).as("__nats"))
      .select(col("doc_id"), col("dl"),
        round(col("__nats") / col("dl"), 4).as("nll"),
        round(exp(col("__nats") / col("dl")), 4).as("ppl"))

  def bigramLogLoss(
      train: DataFrame, docs: DataFrame, text: Column, idCol: Column): DataFrame = {
    def bigramRows(df: DataFrame): DataFrame = bigramPositions(df, text, idCol)
    val uni = train.select(explode(words(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    val totals = uni.groupBy().agg(
      sum(col("n_w")).as("__total"), count(lit(1)).as("__vsize"))
    val bi = bigramRows(train).groupBy("w1", "w2").agg(count(lit(1)).as("n_b"))
    val contrib = bigramRows(docs)
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_w1")), Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_w2")), Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("pos"),
        (-log(when(col("n_b").isNotNull,
            col("n_b").cast("double") / col("n_w1"))
          .otherwise(lit(0.4) * (coalesce(col("n_w2"), lit(0L)) + lit(1L))
            .cast("double") / (col("__total") + col("__vsize")))))
          .as("c"))
    foldLogLoss(contrib)
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * interpolated form of Chen & Goodman 1998 with one absolute
    * discount D = n₁/(n₁+2n₂)):
    *
    *   P(w₂|w₁) = max(n(w₁w₂) − D, 0)/n(w₁) + λ(w₁)·P_cont(w₂)
    *   λ(w₁)    = D · N₁₊(w₁·)/n(w₁)
    *   P_cont(w₂) = (N₁₊(·w₂) + 1)/(N₁₊(··) + |V| + 1)
    *
    * where n(w₁) = Σ_w n(w₁w) (left-context mass), N₁₊ are
    * continuation-type counts, and P_cont carries add-one smoothing
    * with one OOV slot so a held-out w₂ never hits ln 0; an unseen
    * context w₁ scores P_cont(w₂) alone. (The two held-out rules are
    * declared divergences in the same spirit as [[bigramLogLoss]]'s
    * smoothed backoff.) Every model quantity is an exact integer
    * count and D is one division of two integers, so the whole score
    * is engine-portable arithmetic — the DuckDB twin replays it term
    * for term.
    *
    * Scale shape identical to [[bigramLogLoss]]: in-row bigram
    * extraction, partial-agg count tables, three shuffled equi-joins
    * (bigram, context, continuation — no LM broadcast; bigram types
    * outnumber documents at corpus scale), the four model scalars on
    * a 1-row broadcast, position-ordered fold.
    */
  def bigramKnLogLoss(
      train: DataFrame, docs: DataFrame, text: Column, idCol: Column): DataFrame = {
    val bi = bigramPositions(train, text, idCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_b"))
      .truncateLineage(eager = false) // feeds ctx, cont, and the scalars
    val ctx = bi.groupBy("w1").agg(
      sum(col("n_b")).as("n_ctx"), count(lit(1)).as("types_after"))
    val cont = bi.groupBy("w2").agg(count(lit(1)).as("n_cont"))
    val vocab = train.select(explode(words(text)).as("w")).agg(
      countDistinct(col("w")).as("__vsize"))
    val scalars = bi.groupBy().agg(
        sum(when(col("n_b") === 1L, 1L).otherwise(0L)).as("__n1"),
        sum(when(col("n_b") === 2L, 1L).otherwise(0L)).as("__n2"),
        count(lit(1)).as("__btypes"))
      .crossJoin(vocab)
    val d = col("__n1").cast("double") /
      greatest(col("__n1") + lit(2L) * col("__n2"), lit(1L))
    val pcont = (coalesce(col("n_cont"), lit(0L)) + lit(1L)).cast("double") /
      (col("__btypes") + col("__vsize") + lit(1L))
    val p = when(col("n_ctx").isNotNull,
      greatest(col("n_b").cast("double") - d, lit(0.0)) / col("n_ctx") +
        ((d * col("types_after")) / col("n_ctx")) * pcont)
      .otherwise(pcont)
    val contrib = bigramPositions(docs, text, idCol)
      .join(bi.withColumnRenamed("n_b", "__nb_raw"), Seq("w1", "w2"), "left")
      .withColumn("n_b", coalesce(col("__nb_raw"), lit(0L)))
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"), col("pos"), (-log(p)).as("c"))
    foldLogLoss(contrib)
  }

  /** Vocabulary report: the `topK` most frequent whitespace tokens
    * with rank, corpus share, and cumulative coverage (the "how much
    * of the stream do the top-N types cover" tokenizer-planning
    * table). One explode + one partial-agg count per type, then
    * top-K by per-partition heap merge (TakeOrdered — no global
    * sort); the rank/cumsum window runs on the K-row result and the
    * corpus total rides a 1-row broadcast. Shares are single
    * divisions of exact longs — deterministic across engines, no
    * rounding needed. Ties break on token text.
    */
  def vocabReport(docs: DataFrame, text: Column, topK: Int): DataFrame = {
    val counts = docs
      .select(explode(words(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    val total = counts.groupBy().agg(sum(col("n")).as("__total"))
    val w = Window.orderBy(col("n").desc, col("token").asc)
    counts
      .orderBy(col("n").desc, col("token").asc).limit(topK)
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_n", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("token"), col("n"), col("rank"),
        (col("n").cast("double") / col("__total")).as("share"),
        (col("cum_n").cast("double") / col("__total")).as("cum_share"))
  }

  /** Per-document top-`k` terms by TF-IDF (`score = tf · ln(N/df)`,
    * 4-dp rounded for the cross-engine ln). Plan shape: one explode →
    * hash aggregate to the (doc, term, tf) grain; df comes from a
    * second hash aggregate over that grain (map-side partials absorb
    * hot stop-words) and joins back on the term — a shuffled
    * equi-join AQE can skew-split, with corpus N riding a 1-row
    * broadcast. The final top-k window partitions on the DOCUMENT id
    * (bounded by doc length), never on the term key.
    */
  def tfidfTopK(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      k: Int): DataFrame = {
    val grain = docs
      .select(idCol.as("doc_id"), explode(words(lower(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfs = grain.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.groupBy().agg(count(lit(1)).cast("double").as("__n"))
    val scored = grain
      .join(dfs, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("__n") / col("df")), 4))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("token").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"),
        col("df"), col("score"))
  }

  /** First BPE merge step: adjacent-character pair frequencies over
    * the word-frequency table (the tokenizer-training kernel — each
    * merge round re-runs this over re-segmented words). Two hash
    * aggregates, both map-side-partial friendly: corpus → word
    * frequencies, then in-row pair explode (lambdas reference the
    * materialized char-array ATTRIBUTE, per the HOF discipline) →
    * pair counts weighted by word frequency. Top-K is TakeOrdered
    * (per-partition heaps), the rank window runs over K rows.
    */
  /** PMI-scored bigram collocations — the classic phrase-mining
    * kernel (word2vec-style phrase detection): for adjacent word
    * pairs, `pmi = ln(p(ab) / (p(a)·p(b)))`, keeping pairs seen ≥
    * `minCount` times and the `topK` highest. One corpus scan feeds
    * the unigram aggregate, the in-row adjacent-pair explode (lambda
    * over the materialized words ATTRIBUTE, per the HOF discipline),
    * and the token/bigram totals; the vocabulary joins back twice on
    * the word key (broadcast while a vocab fits, AQE decides). All
    * arithmetic in doubles (a corpus-sized token count squared
    * overflows long), 4-dp rounded, ranked on the ROUNDED score so
    * cross-engine ln wobble cannot reorder ties.
    */
  def pmiBigrams(
      docs: DataFrame,
      textCol: Column,
      topK: Int,
      minCount: Long): DataFrame = {
    val toks = docs.select(words(lower(textCol)).as("ws"))
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val totals = toks.agg(
      sum(size(col("ws"))).cast("double").as("n_uni"),
      sum(greatest(size(col("ws")) - 1, lit(0))).cast("double").as("n_bi"))
    val bi = toks
      .select(explode(transform(
        slice(col("ws"), lit(1), greatest(size(col("ws")) - 1, lit(0))),
        (w, i) => struct(w.as("a"), element_at(col("ws"), i + 2).as("b"))))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val biC = bi.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
    val scored = biC
      .join(uni.select(col("w").as("a"), col("c").as("c_a")), Seq("a"))
      .join(uni.select(col("w").as("b"), col("c").as("c_b")), Seq("b"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi", round(log(
        (col("c_ab").cast("double") * col("n_uni") * col("n_uni")) /
          (col("n_bi") * col("c_a").cast("double") * col("c_b").cast("double"))), 4))
    val w = Window.orderBy(col("pmi").desc, col("a").asc, col("b").asc)
    scored.orderBy(col("pmi").desc, col("a").asc, col("b").asc).limit(topK)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "a", "b", "c_ab", "pmi")
  }

  def bpePairs(docs: DataFrame, textCol: Column, topK: Int): DataFrame = {
    val wordFreq = docs
      .select(explode(words(lower(textCol))).as("word"))
      .where(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("wf"))
    val pairs = wordFreq
      .withColumn("__cs", split(col("word"), ""))
      .select(col("wf"), explode(transform(
        slice(col("__cs"), lit(1), size(col("__cs")) - 1),
        (c, i) => concat(c, lit(" "), element_at(col("__cs"), i + 2))))
        .as("pair"))
    val counts = pairs.groupBy("pair").agg(sum("wf").as("n"))
    val w = Window.orderBy(col("n").desc, col("pair").asc)
    counts.orderBy(col("n").desc, col("pair").asc).limit(topK)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Inverted index with capped postings: per term, the document
    * frequency plus the `cap` LOWEST doc ids containing it. The
    * posting cap is computed with salted two-stage top-k aggregation:
    * stage 1 keeps the `cap` smallest ids within each of `salts` salt
    * buckets (every group is ≤ its bucket's share of the docs), stage
    * 2 merges ≤ `salts`·`cap` candidates per term — a hot stop-word
    * never materializes its full posting list in one task, unlike the
    * textbook `collect_list` over the term key or a term-partitioned
    * row_number window. df sums exact per-bucket counts in the same
    * two aggregates. Size `salts` so a worst-case stage-1 buffer
    * (corpus docs / salts ids) fits an executor: 1024 holds a
    * billion-doc stop-word to ~1M ids (≈8 MB) per group while stage 2
    * merges ≤ salts·cap candidates per term.
    */
  def invertedIndex(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      cap: Int,
      salts: Int = 256): DataFrame = {
    val grain = docs
      .select(idCol.as("doc_id"), explode(array_distinct(words(lower(textCol)))).as("token"))
    val partial = grain
      .groupBy(col("token"), pmod(col("doc_id"), lit(salts)).as("__salt"))
      .agg(count(lit(1)).as("__n"),
        slice(array_sort(collect_list(col("doc_id"))), 1, cap).as("__ids"))
    partial
      .groupBy("token")
      .agg(sum("__n").as("df"),
        slice(array_sort(flatten(collect_list(col("__ids")))), 1, cap)
          .as("postings"))
  }

  /** Blocklist ("toxicity") filtering — the Dolma/C4-style content
    * gate: fraction of lowercased words on a blocklist, flag when the
    * ratio exceeds `maxRatio` OR any `hardBlock` term appears at all
    * (the two-tier rule corpus pipelines use: frequency terms vs
    * instant-drop terms). The word lists are driver-side constants
    * compiled into the predicate — a map-only scan pass, like every
    * TextStats filter.
    */
  def blocklistSignals(
      textCol: Column,
      blocked: Seq[String],
      hardBlock: Seq[String],
      maxRatio: Double): Seq[Column] = {
    val ws = words(lower(textCol))
    val n = size(ws).cast("double")
    val hits = size(filter(ws, w => blocked.map(b => w === b).reduce(_ || _)))
    val hard = hardBlock.map(b => array_contains(ws, b))
      .foldLeft(lit(false))(_ || _)
    val ratio = hits.cast("double") / greatest(n, lit(1.0))
    Seq(hits.cast("long").as("n_blocked"),
      round(ratio, 4).as("blocked_ratio"),
      hard.as("hard_hit"),
      (!hard && ratio <= maxRatio).as("keep"))
  }

  /** Fixed-weight logistic quality classifier — the serving path of
    * the fastText-style quality models the GPT-3 / LLaMA pipelines
    * filter with (Brown et al. 2020 §A; a trained model would only
    * swap the coefficient literals): `p = σ(w·x + b)` over three
    * engine quality signals (length score, alphabetic ratio, English
    * stop-word density), `keep = p ≥ 0.5`. Entirely fused into the
    * scan — one pass, zero shuffle at any corpus scale; the logit
    * stays unrounded for the keep threshold (the [[qualityScoreRaw]]
    * boundary-doc rule) and the displayed probability rounds to 4 dp.
    */
  /** The classifier's unrounded probability — reusable wherever the
    * gate must compare on the raw value (batch classifier, streaming
    * curation).
    */
  def qualityProbability(
      textCol: Column,
      bias: Double = -2.0,
      wLen: Double = 2.0,
      wAlpha: Double = 2.5,
      wStop: Double = 3.0): Column = {
    val n = wordCount(textCol).cast("double")
    val chars = length(textCol).cast("double")
    val alpha = length(regexp_replace(textCol, "[^A-Za-z ]", "")).cast("double")
    val lenScore = least(n / lit(64.0), lit(1.0))
    val alphaScore = alpha / greatest(chars, lit(1.0))
    val stopScore = stopwordHits(textCol, "en").cast("double") / greatest(n, lit(1.0))
    val z = lit(bias) + lit(wLen) * lenScore + lit(wAlpha) * alphaScore +
      lit(wStop) * stopScore
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  def qualityClassifier(
      docs: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    val p = qualityProbability(textCol)
    docs.select(idCol.as("doc_id"), round(p, 4).as("p_quality"),
      (p >= 0.5).as("keep"))
  }

  /** Distributed logistic-regression TRAINING — the learning step
    * [[qualityProbability]]'s docstring points at ("a trained model
    * would only swap the coefficient literals"): full-batch gradient
    * descent on log-loss over the SAME three signals the serving
    * path scores (length score, alphabetic ratio, stop-word
    * density), so the learned weights drop straight into the serving
    * expression.
    *
    * The 100 TB shape: the feature relation (4 doubles per doc) is
    * computed in ONE corpus pass and lineage-cut; each GD iteration
    * is then one aggregate job over that narrow relation — map-side
    * partial sums of the per-row gradient, weights on the driver (4
    * doubles), `iters` total jobs. Mean-gradient updates
    * (`w ← w − lr·Σg/N`, zero-initialized, no regularization —
    * declared scope). Returns the full iteration trace
    * (iter, bias, w_len, w_alpha, w_stop), every row pinned by a
    * DuckDB twin that unrolls the identical GD in chained CTEs.
    */
  def trainQualityClassifier(
      docs: DataFrame,
      textCol: Column,
      label: Column,
      iters: Int,
      lr: Double): DataFrame = {
    val spark = docs.sparkSession
    val n = wordCount(textCol).cast("double")
    val chars = length(textCol).cast("double")
    val alpha = length(regexp_replace(textCol, "[^A-Za-z ]", "")).cast("double")
    // null labels count as negatives (y = 0), matching the oracle
    // twin's CASE WHEN — a null must not silently drop out of avg()
    val feats = docs.select(
        coalesce(label.cast("double"), lit(0.0)).as("y"),
        least(n / lit(64.0), lit(1.0)).as("x1"),
        (alpha / greatest(chars, lit(1.0))).as("x2"),
        (stopwordHits(textCol, "en").cast("double") / greatest(n, lit(1.0))).as("x3"))
      .truncateLineage(eager = false)
    var w = Array(0.0, 0.0, 0.0, 0.0) // bias, w_len, w_alpha, w_stop
    val trace = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double, Double, Double)]
    for (it <- 1 to iters) {
      val z = lit(w(0)) + lit(w(1)) * col("x1") +
        lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
      val d = lit(1.0) / (lit(1.0) + exp(-z)) - col("y")
      val g = feats.agg(
        avg(d).as("gb"), avg(d * col("x1")).as("g1"),
        avg(d * col("x2")).as("g2"), avg(d * col("x3")).as("g3")).collect()(0)
      require(!g.isNullAt(0), "trainQualityClassifier: empty corpus")
      // quantize each gradient component to the 2^-30 grid before it
      // feeds forward (r10 advice): a distributed avg() is partial-sum
      // -order-dependent at the ulp level, and the weights carry
      // unrounded across iterations — snapping to a grid ~10^6×
      // coarser than that noise makes the fed-forward weights
      // bit-identical on any partitioning AND on the DuckDB twin
      // (which floors the same way; with lr a power of two the
      // lr·g products and running weights then stay exact multiples
      // of the grid, so no further drift can accumulate).
      def q30(x: Double): Double = math.floor(x * 1073741824.0) / 1073741824.0
      w = Array(
        w(0) - lr * q30(g.getDouble(0)), w(1) - lr * q30(g.getDouble(1)),
        w(2) - lr * q30(g.getDouble(2)), w(3) - lr * q30(g.getDouble(3)))
      trace += ((it.toLong, w(0), w(1), w(2), w(3)))
    }
    import spark.implicits._
    trace.toSeq.toDF("iter", "bias", "w_len", "w_alpha", "w_stop")
      .select(col("iter"),
        (round(col("bias"), 6) + 0.0).as("bias"),
        (round(col("w_len"), 6) + 0.0).as("w_len"),
        (round(col("w_alpha"), 6) + 0.0).as("w_alpha"),
        (round(col("w_stop"), 6) + 0.0).as("w_stop"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): per language, split documents into head / middle / tail
    * thirds by LM perplexity — CCNet computes per-language KenLM
    * perplexity percentiles and keeps the head (and often middle) as
    * the quality cut. Here the LM is the corpus-as-LM unigram NLL
    * ([[unigramLogLoss]], already oracle-pinned) and the cuts are the
    * EXACT per-language NLL terciles via the grouped two-phase rank
    * (no `percentile_approx` drift, no language-partitioned window —
    * a 90%-English crawl never serializes into one rank task).
    *
    * Bucket rule (both cuts rounded to 4 dp so the boundary decision
    * is engine-portable): `nll ≤ q33 → head`, `≤ q67 → middle`, else
    * `tail`. Returns `(doc_id, lang, nll, bucket)`.
    *
    * Scale shape: the NLL relation is doc-sized; terciles add two
    * bounded aggregates over it, and the |langs|×2 cuts COLLECT to
    * the driver (result-sized, the rollup-rules/DSIR-λ precedent) so
    * the bucket assignment is a literal CASE chain on a second
    * NLL pass — without the collect, the cuts subtree and the final
    * join both re-evaluate the token-explode NLL inside one job.
    */
  def pplBuckets(
      docs: DataFrame,
      textCol: Column,
      langCol: Column,
      idCol: Column): DataFrame = {
    // the doc-sized NLL relation feeds BOTH the per-lang cut
    // derivation and the final bucket projection — materialize it
    // once instead of re-running the vocab join per consumer
    // deferred cut: the cuts-collect below is the first action and
    // materializes it — no separate eager job
    val nll = graft.Lineage.truncateDeferred(
      unigramLogLoss(docs, textCol, idCol)
        .join(docs.select(idCol.as("doc_id"), langCol.as("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("nll")))
    val cuts = Quantiles
      .exactQuantilesBy(nll, "lang", col("nll"), Seq(1.0 / 3, 2.0 / 3))
      .groupBy("lang")
      .agg(round(min(when(col("q") < 0.5, col("value"))), 4).as("q33"),
        round(min(when(col("q") > 0.5, col("value"))), 4).as("q67"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val q33 = cuts.foldLeft(lit(Double.NaN)) { case (acc, (l, (a, _))) =>
      when(col("lang") === l, lit(a)).otherwise(acc)
    }
    val q67 = cuts.foldLeft(lit(Double.NaN)) { case (acc, (l, (_, b))) =>
      when(col("lang") === l, lit(b)).otherwise(acc)
    }
    nll.select(col("doc_id"), col("lang"), col("nll"),
      when(col("nll") <= q33, "head")
        .when(col("nll") <= q67, "middle")
        .otherwise("tail").as("bucket"))
  }
}
