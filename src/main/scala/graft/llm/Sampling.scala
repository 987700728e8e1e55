package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling / sharding / packing for training-data
  * pipelines — the selection half of corpus curation (the scoring
  * half lives in [[TextStats]], the dedup half in [[Dedup]]).
  *
  * Everything here keys off one primitive: a uniform-[0,1) hash of
  * the row id ([[hash01]], md5-derived like [[Dedup]]'s shingle
  * hashes). That buys three properties a `rand()`-based sample can
  * never give a 100 TB pipeline:
  *   - reproducible across runs, engines, and retries (a re-executed
  *     task keeps the same sample — no lineage nondeterminism);
  *   - NO shuffle for sampling: quota filters are narrow `WHERE`
  *     clauses that ride the parquet scan;
  *   - auditable: whether a given document was sampled is a pure
  *     function of its id and the config.
  */
object Sampling {

  /** First 60 md5 bits of the id's string form as a long — the ONE
    * spelling of the engine-portable hash contract (DuckDB twin:
    * `('0x' || substr(md5(id::varchar), 1, 15))::bigint`). Every
    * sampler derives from this so a change cannot de-synchronize one
    * oracle from the others.
    */
  def hashBits60(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** Uniform [0,1) from [[hashBits60]] (÷ 2^60). */
  def hash01(id: Column): Column =
    hashBits60(id).cast("double") / lit(1152921504606846976d) // 2^60

  /** Salted variant: independent draws per use site (a doc sampled
    * for split A must not be correlated with its draw for split B).
    */
  def hash01(id: Column, salt: String): Column =
    hashBits60(concat(id.cast("string"), lit("|" + salt)))
      .cast("double") / lit(1152921504606846976d)

  /** Fill-in-the-middle transformation (Bavarian et al. 2022, "FIM"):
    * deterministically split each document into prefix / middle /
    * suffix at two id-hashed cut points and reassemble in PSM order
    * (`<PRE>` prefix `<SUF>` suffix `<MID>` middle) — the standard
    * infilling training example, as a pure map-only Column transform
    * (zero shuffle at any scale). The cut points are salted-hash
    * fractions of the character length, so the transform is
    * reproducible across engines and runs; pipelines applying FIM to
    * only a rate of documents compose this with [[hash01]] gating.
    */
  def fimTransform(
      docs: DataFrame,
      textCol: Column,
      idCol: Column): DataFrame = {
    val n = length(textCol)
    val u1 = hash01(idCol, "fim1")
    val u2 = hash01(idCol, "fim2")
    val a = floor(least(u1, u2) * n).cast("int")
    val b = floor(greatest(u1, u2) * n).cast("int")
    val prefix = textCol.substr(lit(1), a)
    val middle = textCol.substr(a + lit(1), b - a)
    val suffix = textCol.substr(b + lit(1), n - b)
    docs.select(idCol.as("doc_id"),
      a.cast("long").as("prefix_len"),
      (b - a).cast("long").as("middle_len"),
      concat(lit("<PRE>"), prefix, lit("<SUF>"), suffix,
        lit("<MID>"), middle).as("fim_text"))
  }

  /** SimCSE-style positive crop pairs (Gao et al. 2021's dropout
    * positives, in the deterministic data-side form dense-retrieval
    * pipelines use — Izacard et al. 2022 "Contriever" random
    * croppings): two contiguous token spans of the same document are
    * a positive pair for contrastive pretraining. Each crop is
    * ceil(n/2) tokens long and its start index is the engine-portable
    * md5-uniform of (id, salt) over the valid range, so the pair —
    * and the reported token overlap `max(0, L − |a − b|)` — is
    * reproducible on any engine, partitioning, or retry (the
    * [[fimTransform]] determinism contract). Docs under `minTokens`
    * drop (a crop of a 2-token doc is not a training signal).
    * Map-only: one pass, zero shuffle at any corpus size.
    */
  def cropPairs(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      minTokens: Int = 4): DataFrame = {
    // functions.split spelled out — this object's own `split` (the
    // dataset splitter) shadows it. Empty tokens filter out (trim
    // strips only U+0020, so a trailing newline would otherwise mint
    // a phantom token — the spanCorrupt discipline)
    val ws = filter(
      org.apache.spark.sql.functions.split(trim(textCol), "\\s+"),
      x => x =!= "")
    val n = size(ws).cast("long")
    val l = floor((n + lit(1L)) / lit(2.0)).cast("long")
    val range = n - l + lit(1L)
    val sa = hashBits60(concat(idCol.cast("string"), lit("|cropa"))) % range
    val sb = hashBits60(concat(idCol.cast("string"), lit("|cropb"))) % range
    val overlap = greatest(lit(0L), l - abs(sa - sb))
    docs.where(textCol.isNotNull)
      .where(size(ws) >= minTokens)
      .select(idCol.cast("long").as("doc_id"),
        l.as("crop_len"),
        array_join(slice(ws, (sa + lit(1L)).cast("int"), l.cast("int")), " ").as("crop_a"),
        array_join(slice(ws, (sb + lit(1L)).cast("int"), l.cast("int")), " ").as("crop_b"),
        overlap.as("overlap"))
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4): each word
    * position draws a deterministic salted-hash coin at `rate`;
    * consecutive masked words merge into one span, span k is replaced
    * by the sentinel `<X_k>` in the corrupted text, and the targets
    * stream lists each sentinel followed by the words it hides — the
    * denoising-objective example pair. Distributed shape: one word
    * explode, per-DOC windows (lag for span starts, a running sum for
    * span ids — fleet-sized partition keys, never corpus-global), and
    * an ordered in-row fold back to two strings per document.
    */
  def spanCorrupt(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      rate: Double = 0.15): DataFrame = {
    val words = docs
      .select(idCol.as("doc_id"),
        posexplode(filter( // functions.split is shadowed by Sampling.split
          org.apache.spark.sql.functions.split(trim(textCol), "\\s+"),
          x => x =!= "")).as(Seq("pos", "w")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val keyed = words
      .withColumn("m", hash01(
        // 1-based position in the hash key (generate_subscripts
        // convention, matching the DuckDB twin)
        concat(col("doc_id").cast("string"), lit("|"),
          (col("pos") + 1).cast("string")),
        "corrupt") < lit(rate))
      .withColumn("st", col("m") && !coalesce(lag("m", 1).over(w), lit(false)))
      .withColumn("sid",
        sum(when(col("st"), 1).otherwise(0)).over(w).cast("int"))
    val corrTok = when(!col("m"), col("w"))
      .when(col("st"), concat(lit("<X_"), col("sid").cast("string"), lit(">")))
    val tgtTok = when(col("m"),
      when(col("st"),
        concat(lit("<X_"), col("sid").cast("string"), lit("> "), col("w")))
        .otherwise(col("w")))
    def fold(tok: Column): Column = array_join(
      transform(
        array_sort(collect_list(when(tok.isNotNull,
          struct(col("pos"), tok.as("t"))))),
        s => s("t")), " ")
    val agg = keyed.groupBy("doc_id").agg(
      max(col("sid")).cast("long").as("n_spans"),
      fold(corrTok).as("corrupted"),
      fold(tgtTok).as("targets"))
    docs.select(idCol.as("doc_id"), textCol.as("__text"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__text").isNull, lit(null))
          .otherwise(coalesce(col("n_spans"), lit(0L))).as("n_spans"),
        when(col("__text").isNull, lit(null))
          .otherwise(coalesce(col("corrupted"), lit(""))).as("corrupted"),
        when(col("__text").isNull, lit(null))
          .otherwise(coalesce(col("targets"), lit(""))).as("targets"))
  }

  /** Stratified sample: keep each row with its stratum's rate
    * (`rates`, driver-side map — strata are few by definition),
    * `defaultRate` for unlisted strata. Pure narrow filter — at any
    * scale this is a predicate on the scan, zero shuffle, and the
    * realized fraction concentrates on the quota by id-hash
    * uniformity.
    */
  def sampleStratified(
      df: DataFrame,
      stratum: Column,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      idCol: String = "doc_id"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(stratum === k, lit(r)).otherwise(acc)
    }
    df.where(hash01(col(idCol)) < rate)
  }

  /** Per-source data-mixture report — the token-budget planning table
    * a training run starts from: docs and tokens per source, each
    * source's token share of the corpus, and its temperature-weighted
    * target share (share ∝ p^tau, normalized; tau < 1 upsamples tail
    * sources like the mT5/XLM-R mixing rule).
    *
    * Scale shape: ONE corpus pass — the token count folds into a
    * per-source hash aggregate (map-side partials), and every
    * derived column lives on the source-cardinality-sized result
    * (small by definition), where the unpartitioned total windows are
    * k-row driver-scale work, not corpus work.
    */
  def mixtureReport(
      df: DataFrame,
      key: Column,
      tokens: Column,
      tau: Double = 1.0): DataFrame = {
    require(tau > 0.0, "tau > 0 required")
    val all = Window.partitionBy()
    df.groupBy(key.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokens.cast("long")).as("n_tokens"))
      .withColumn("token_frac",
        col("n_tokens").cast("double") / sum("n_tokens").over(all).cast("double"))
      .withColumn("pw", pow(col("token_frac"), tau))
      .withColumn("weight", col("pw") / sum("pw").over(all))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("token_frac"), 6).as("token_frac"),
        round(col("weight"), 6).as("weight"))
  }

  /** Temperature-based source mixing — the multilingual/multi-source
    * rebalancing rule of the mT5/XLM-R pipelines: key `k` with corpus
    * share p_k is sampled ∝ p_k^tau (tau < 1 upsamples tail sources,
    * tau = 1 keeps the natural mix), scaled so the expected kept
    * fraction of the corpus is `targetFraction`, with per-key accept
    * rates capped at 1.
    *
    * Scale shape: the per-key count aggregate is source-cardinality-
    * sized (small by definition), the rate table broadcasts back, and
    * selection stays a narrow salted-hash filter on the scan — the
    * corpus is read once and never shuffled. Rates are rounded to
    * 6 dp so the accept boundary is engine-portable.
    */
  def temperatureSample(
      df: DataFrame,
      key: Column,
      tau: Double,
      targetFraction: Double,
      idCol: String = "doc_id"): DataFrame = {
    require(tau > 0.0 && targetFraction > 0.0 && targetFraction <= 1.0,
      "tau > 0 and 0 < targetFraction <= 1 required")
    val all = Window.partitionBy()
    val rates = df.groupBy(key.as("__mix_key")).agg(count(lit(1)).cast("double").as("c"))
      .withColumn("n", sum("c").over(all))
      .withColumn("pw", pow(col("c") / col("n"), tau))
      // left-associated exactly like the DuckDB oracle twin
      // (`0.3 * n * pw / sum(pw) OVER () / c`) — a different float
      // association could round differently at the 6-dp boundary and
      // de-synchronize the accept set between engines
      .withColumn("rate", round(
        least(lit(1.0),
          lit(targetFraction) * col("n") * col("pw") / sum("pw").over(all) / col("c")),
        6))
      .select(col("__mix_key"), col("rate"))
    df.join(broadcast(rates), key === col("__mix_key"))
      .where(hash01(col(idCol), "temp") < col("rate"))
      .drop("__mix_key", "rate")
  }

  /** Materialize a temperature mixture as EPOCH REPLICATION — the
    * step after [[mixtureReport]]: each source's target share
    * `w = p^tau / Σp^tau` becomes `epochs = w · total / tokens_s`
    * traversals of that source, so the emitted token mix matches the
    * report. Docs replicate ⌊e⌋ times plus one more when the salted
    * id-draw lands under frac(e) — downsampled sources (e < 1) thin
    * out, upsampled tails (e > 1) repeat with a `copy` index the
    * trainer can shuffle on. Deterministic per id, stable under
    * retries.
    *
    * Scale shape: the epochs table is source-cardinality-sized and
    * broadcasts back; emission is one narrow filter + one bounded
    * explode on the scan — the corpus is read once, never shuffled.
    * Epochs round to 6 dp (from the 6-dp weight) so the replication
    * boundary is engine-portable.
    */
  def mixtureApply(
      df: DataFrame,
      key: Column,
      tokens: Column,
      tau: Double = 1.0,
      idCol: String = "doc_id"): DataFrame = {
    val all = Window.partitionBy()
    val epochs = df.groupBy(key.as("__mix_key"))
      .agg(sum(tokens.cast("long")).as("nt"))
      .withColumn("total", sum("nt").over(all))
      .withColumn("pw", pow(col("nt").cast("double") / col("total"), tau))
      .withColumn("w", round(col("pw") / sum("pw").over(all), 6))
      // left-associated like the oracle twin: w * total / nt
      .withColumn("epochs", round(col("w") * col("total") / col("nt"), 6))
      .select(col("__mix_key"), col("epochs"))
    val draw = hash01(col(idCol), "epoch")
    df.select(col(idCol), key.as("__mix_key"))
      .join(broadcast(epochs), Seq("__mix_key"))
      .withColumn("copies",
        (floor(col("epochs")) +
          when(draw < col("epochs") - floor(col("epochs")), 1L).otherwise(0L))
          .cast("long"))
      .where(col("copies") > 0L)
      .select(col(idCol), col("__mix_key").as("source"), col("epochs"),
        explode(sequence(lit(0L), col("copies") - 1L)).as("copy"))
  }

  /** Deterministic train/validation/test-style split: labels each row
    * by where its (salted) hash falls in the cumulative `fractions`
    * ladder. One pass, no shuffle, stable under retries.
    */
  def split(
      df: DataFrame,
      fractions: Seq[(String, Double)],
      salt: String = "split",
      idCol: String = "doc_id"): DataFrame =
    splitGrouped(df, fractions, col(idCol), salt)

  /** Group-keyed split: the hash draw keys on `groupCol` instead of
    * the row id, so every row of a group lands in the SAME split —
    * the leakage-safe assignment (near-dup clusters, same-domain
    * pages, chunked long docs must not straddle train/test). Same
    * narrow-filter shape as [[split]]: one hash per row, zero
    * shuffle beyond whatever produced the group key.
    */
  def splitGrouped(
      df: DataFrame,
      fractions: Seq[(String, Double)],
      groupCol: Column,
      salt: String = "split"): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val u = hash01(groupCol, salt)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val label = fractions.zip(cum).init.foldRight(lit(fractions.last._1)) {
      case (((name, _), hi), acc) => when(u < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Shard assignment + deterministic within-shard order — the
    * "global shuffle" of a training corpus without a global sort:
    * shard = id-hash mod `shards` (write-partition key), `pos` =
    * rank by hash inside the shard. Each shard orders independently
    * (one bounded sort per shard, shards sized by the writer), and
    * the combined (shard, pos) order is a reproducible uniform
    * permutation of the corpus.
    */
  def shardAssign(
      df: DataFrame,
      shards: Int,
      idCol: String = "doc_id"): DataFrame = {
    val h = hashBits60(col(idCol))
    val keyed = df.withColumn("shard", (h % shards).cast("int"))
    val w = Window.partitionBy("shard").orderBy(h.asc, col(idCol).asc)
    keyed.withColumn("pos", row_number().over(w).cast("long") - 1)
  }

  /** Shard manifest — the integrity record a dataset release ships
    * next to its shards: per shard, document count, token mass, byte
    * mass, and an ORDER-INSENSITIVE content checksum (sum of per-doc
    * content hashes mod 2³¹−1 — commutative, so the checksum is
    * reproducible whatever order the shard's rows arrive in, and any
    * dropped/duplicated/mutated document changes it; the 31-bit
    * modulus keeps the un-modded int64 sum overflow-free up to 2³²
    * documents PER SHARD, a bound the shard count is sized to at any
    * corpus scale). One hash aggregate with map-side partials;
    * verification re-runs the same aggregate on the consumer side.
    */
  def shardManifest(
      df: DataFrame,
      textCol: Column,
      shards: Int,
      idCol: String = "doc_id"): DataFrame = {
    val p = lit(2147483647L) // 2^31 - 1
    shardAssign(df, shards, idCol)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextStats.tokensWhitespace(textCol).cast("long")).as("n_tokens"),
        sum(length(textCol).cast("long")).as("n_chars"),
        pmod(sum(pmod(hashBits60(textCol), p)), p).as("checksum"))
  }

  /** Sequence packing, concat-and-chop style: in the deterministic
    * shard order of [[shardAssign]], documents concatenate into one
    * token stream per shard and the stream is chopped into
    * `budget`-token training sequences. Emits each document's token
    * `offset` in its shard's stream and the `bin` (sequence index)
    * where it starts — a document may straddle into the next bin,
    * exactly like pretraining's max_seq_len chopping.
    *
    * One window cumsum per shard, no cross-shard dependency: the
    * per-shard sort is bounded by shard size (the writer picks
    * `shards` so that holds), and shards pack in parallel.
    */
  def packSequences(
      df: DataFrame,
      tokensCol: Column,
      budget: Long,
      shards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val sharded = shardAssign(df, shards, idCol)
      .withColumn("tokens", tokensCol.cast("long"))
    val w = Window.partitionBy("shard").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("offset", sum(col("tokens")).over(w) - col("tokens"))
      .withColumn("bin", floor(col("offset") / lit(budget)).cast("long"))
  }

  /** Overlapping token-window chunking — the per-document form of
    * training-sequence prep (packSequences is the cross-document
    * form): chunk `i` covers whitespace tokens
    * `[i·stride, i·stride + window)`, so consecutive chunks share
    * `window − stride` tokens of context; the tail chunk is partial.
    * Every start below the token count emits, so each token lands in
    * ⌈window/stride⌉ chunks and nothing is dropped. Purely narrow:
    * one split + one bounded explode per row — no shuffle at any
    * corpus scale, output ≈ n/stride rows per doc.
    */
  def chunkTokens(
      df: DataFrame,
      text: Column,
      window: Int,
      stride: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    val toks = org.apache.spark.sql.functions.split(trim(text), "\\s+")
    df.select(col(idCol), toks.as("toks"))
      .where(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride)))
          .as(Seq("chunk_id", "start")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        col("start").cast("long").as("start"),
        least(size(col("toks")) - col("start"), lit(window)).cast("long")
          .as("n_tokens"),
        // slice is 1-based; the tail slice is naturally partial
        array_join(slice(col("toks"), col("start") + 1, lit(window)), " ")
          .as("chunk"))
  }

  /** Quality-ranked token-budget selection: keep the best documents
    * (by `qualityCol` descending, id ascending as the total-order
    * tiebreak) whose running token total stays within `budget` — the
    * "spend N tokens on the best data" curation step.
    *
    * The running total is a two-phase distributed cumulative sum, the
    * shape that survives 100 TB: range-partition the slim
    * (id, tokens, quality) projection on the rank order, aggregate
    * per-range token totals (map-side partials, `buckets` rows out),
    * turn those into per-range offsets with a window over the
    * `buckets`-row relation (metadata-sized, explicitly NOT the
    * corpus), broadcast the offsets back, and finish with a running
    * sum windowed WITHIN each range partition — every window
    * partition is one balanced range, never a global single-task
    * sort. The range relation is lineage-truncated so the offset pass
    * and the output pass share one materialization of the shuffle.
    */
  def tokenBudget(
      docs: DataFrame,
      textCol: Column,
      budget: Long,
      idCol: Column = col("doc_id"),
      buckets: Int = 32): DataFrame = {
    import graft.Lineage.TruncateOps
    val scored = docs.select(
      idCol.as("doc_id"),
      size(org.apache.spark.sql.functions.split(trim(textCol), "\\s+"))
        .cast("long").as("tokens"),
      TextStats.qualityScoreRaw(textCol).as("q"))
    val ranged = scored
      .repartitionByRange(buckets, col("q").desc, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .truncateLineageDeferred()
    val offsets = ranged.groupBy("pid").agg(sum("tokens").as("ptot"))
      .withColumn("off",
        coalesce(sum("ptot").over(
          Window.orderBy("pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "off")
    ranged
      .join(broadcast(offsets), Seq("pid"))
      .withColumn("cum",
        col("off") + sum("tokens").over(
          Window.partitionBy("pid").orderBy(col("q").desc, col("doc_id"))))
      .where(col("cum") <= budget)
      .select(col("doc_id"), col("tokens"),
        round(col("q"), 4).as("quality"), col("cum").as("cum_tokens"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-ES): each row draws key `u^(1/w)` with `u` the deterministic
    * [[hash01]] uniform, and the k largest keys are the sample —
    * inclusion probability proportional to weight, no replacement,
    * ONE pass. The top-k is TakeOrdered (per-partition heaps + a
    * k-row driver merge), never a global sort; the whole operator is
    * a narrow projection + heap at any corpus scale. Weights must be
    * positive.
    */
  /** The 60-bit md5 hash ([[hashBits60]]) computed locally — the
    * same value `conv(substring(md5(id),1,15),16,10)` yields in-plan,
    * for kernels that run outside Column expressions (the streaming
    * bottom-k state fold). Equality across the three spellings
    * (Column, local, DuckDB) is what `StreamSampleSpec` pins.
    */
  def hashBits60Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(15)
    var i = 0
    while (sb.length < 15) { // 8 bytes cover 16 hex chars
      val b = d(i) & 0xff
      sb.append(Character.forDigit(b >> 4, 16))
      if (sb.length < 15) sb.append(Character.forDigit(b & 0xf, 16))
      i += 1
    }
    java.lang.Long.parseLong(sb.toString, 16)
  }

  /** Local twin of the salted [[hash01]]. */
  def hash01Local(id: String, salt: String): Double =
    hashBits60Local(id + "|" + salt) / 1152921504606846976d // 2^60

  /** Per-stratum bottom-k uniform sample — the MERGEABLE form of
    * reservoir sampling: within each stratum keep the k rows with the
    * smallest salted id-hash. Because `bottomK(A ∪ B) =
    * merge(bottomK(A), bottomK(B))`, the sample composes across
    * shards, retries, and micro-batches with no randomness state —
    * the property the streaming twin
    * ([[graft.streaming.StreamSample]]) builds on, and what makes the
    * batch result reproducible bit-for-bit on any engine via the
    * md5-uniform contract. Scale shape: the same salted two-stage
    * aggregate as [[graft.events.TopK.topKBy]] — a hot stratum (one
    * language carrying half the corpus) never materializes more than
    * its per-salt share in any task, and the corpus never shuffles
    * (only ≤ strata·salts·k candidate rows do).
    */
  def sampleBottomK(
      df: DataFrame,
      stratum: Column,
      idCol: Column,
      k: Int,
      salt: String = "resv",
      salts: Int = 256): DataFrame = {
    require(k >= 1, "k must be positive")
    val item = struct(hash01(idCol, salt).as("u"), idCol.as("id"))
    // array_distinct after the sort: a re-delivered id contributes ONE
    // (u, id) item, never two of the k slots — the same idempotence
    // the streaming twin gets from folding into keyed state, which is
    // what makes stream ≡ batch hold under at-least-once replay
    val stage1 = df
      .groupBy(stratum.as("stratum"), pmod(hash(idCol), lit(salts)).as("__salt"))
      .agg(slice(array_distinct(array_sort(collect_list(item))), 1, k).as("__top"))
    stage1
      .groupBy("stratum")
      .agg(slice(array_distinct(array_sort(flatten(collect_list(col("__top"))))), 1, k)
        .as("__top"))
      .select(col("stratum"), posexplode(col("__top")))
      .select(col("stratum"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("id"), col("col.u").as("u"))
  }

  def sampleWeighted(
      df: DataFrame,
      idCol: Column,
      weightCol: Column,
      k: Int): DataFrame = {
    val key = pow(hash01(idCol), lit(1.0) / weightCol.cast("double"))
    df.select(idCol.as("id"), weightCol.cast("long").as("weight"),
        key.as("__key"))
      .orderBy(col("__key").desc, col("id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("__key").desc, col("id").asc)).cast("long"))
      .select(col("id"), col("weight"), col("rank"))
  }

  /** A-ES resampling on a REAL-valued weight column (the
    * [[sampleWeighted]] contract generalized past integer weights —
    * what [[dsirWeights]]' `exp(log w)` importance weights need):
    * key `u^(1/w)`, top-k by key. Same scale shape: narrow
    * projection + TakeOrdered heaps, no shuffle of the corpus.
    */
  def resampleByWeight(
      df: DataFrame,
      idCol: Column,
      weightCol: Column,
      k: Int): DataFrame = {
    val w = weightCol.cast("double")
    val key = pow(hash01(idCol), lit(1.0) / w)
    df.select(idCol.as("id"), round(w, 6).as("weight"), key.as("__key"))
      .orderBy(col("__key").desc, col("id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("__key").desc, col("id").asc)).cast("long"))
      .select(col("id"), col("weight"), col("rank"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how much more likely its hashed n-gram features are
    * under a TARGET distribution (a small high-quality subset) than
    * under the RAW corpus distribution —
    * `log w(d) = Σ_f n_f(d) · (ln p̂_tgt(bucket(f)) − ln p̂_raw(bucket(f)))`
    * with word unigram+bigram features hashed into `buckets` cells
    * and add-one smoothing on both distributions (the paper's hashed
    * generative model). The weights feed [[sampleWeighted]] /
    * [[hash01]]-Gumbel resampling downstream.
    *
    * Scale shape — the DSIR paper's own two-pass design, with ZERO
    * corpus shuffle: pass 1 folds each document's whole feature
    * stream into a bucket-sorted count array IN-ROW (native
    * [[graft.functions.DsirBuckets]] kernel — no feature explode),
    * and the two distributions reduce the slim exploded counts into
    * a `buckets`-row aggregate whose log-ratios collect to the
    * driver (result-sized, like rollup rules). Pass 2 is map-only:
    * each document folds `n · λ(bucket)` over its own count array
    * against the literal λ table, in bucket order (sorted fold) so
    * the float sum is deterministic and engine-portable.
    */
  def dsirWeights(
      docs: DataFrame,
      textCol: Column,
      targetPred: Column,
      idCol: Column = col("doc_id"),
      buckets: Int = 1024): DataFrame = {
    val counted = docs.select(idCol.as("doc_id"), targetPred.as("__tgt"),
      graft.functions.TextKernels.dsirBuckets(textCol, buckets).as("bc"))
    val dist = counted
      .select(col("__tgt"), explode(col("bc")).as("e"))
      .groupBy(col("e.bucket").as("bucket"))
      .agg(sum(when(col("__tgt"), col("e.n")).otherwise(0L)).as("ct"),
        sum(col("e.n")).as("cr"))
    val totals = dist.groupBy().agg(
      sum(col("ct")).as("__tt"), sum(col("cr")).as("__tr"))
    val lam = new Array[Double](buckets)
    dist.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((col("ct") + 1).cast("double") / (col("__tt") + buckets)) -
          log((col("cr") + 1).cast("double") / (col("__tr") + buckets))).as("lam"))
      .collect()
      .foreach(r => lam(r.getInt(0)) = r.getDouble(1))
    val lamArr = array(lam.toSeq.map(lit): _*)
    counted.select(col("doc_id"),
      aggregate(col("bc"), lit(0L),
        (acc, s) => acc + s.getField("n")).as("n_feats"),
      round(
        aggregate(col("bc"), lit(0.0),
          (acc, s) => acc +
            s.getField("n") * element_at(lamArr, s.getField("bucket") + 1)),
        4).as("log_weight"))
  }
}
