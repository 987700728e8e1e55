package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Lineage.TruncateOps

/** Document deduplication operators for large-scale training-data
  * pipelines: exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale discipline (the non-negotiable at 100 TB): every near-dup
  * variant generates candidates through *bucketing* (LSH bands /
  * group keys) followed by in-bucket verification — there is no
  * all-pairs or cartesian stage anywhere. Hashes are built from
  * `md5` so results are engine-portable (same values in any SQL
  * engine) and need no seeded RNG.
  */
object Dedup {

  // ------------------------------------------------------------------
  // Exact dedup
  // ------------------------------------------------------------------

  /** Exact dedup: keep the lowest-id document per identical `keyCol`.
    * A single hash aggregate (`min`) — no window, no sort — so it is
    * one shuffle on the dedup key and map-side combines do the heavy
    * lifting on skewed duplicate classes.
    */
  def exact(docs: DataFrame, keyCol: Column, idCol: Column = col("doc_id")): DataFrame =
    docs
      .groupBy(keyCol.as("dedup_key"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup returning the surviving rows (keep-first by id). */
  def exactKeep(docs: DataFrame, keyCol: Column, idCol: Column = col("doc_id")): DataFrame = {
    val keep = docs
      .groupBy(keyCol.as("k"))
      .agg(min(idCol).as("keep_id"))
      .select("keep_id")
    docs.join(keep, idCol === col("keep_id"), "left_semi")
  }

  /** Incremental ingest dedup: drop arrivals whose content key
    * already exists in the ingested store — ONE hash anti-join on the
    * key (AQE skew-splittable; the store side carries only its
    * distinct keys, so a boilerplate key the store holds a million
    * times costs one row). The cross-corpus complement of
    * [[exactKeep]]: run this at ingest against the compacted store,
    * run `exactKeep` inside each batch.
    */
  def dedupAgainst(
      arrivals: DataFrame,
      store: DataFrame,
      arrivalKey: Column,
      storeKey: Column): DataFrame =
    arrivals.withColumn("__k", arrivalKey)
      .join(store.select(storeKey.as("__k")).distinct(), Seq("__k"), "left_anti")
      .drop("__k")

  /** Per-group duplication audit: how much of a group's shingle mass
    * is repeated content — the curation diagnostic that decides which
    * sources are worth near-dup passes at all. Exact distinct counts
    * via the two-phase aggregate (`groupBy(group, shingle).count` →
    * `groupBy(group)`) — the first stage's map-side partials collapse
    * a boilerplate shingle before the shuffle, so a hot 5-gram costs
    * one row per map partition, never a `count(DISTINCT)` expand or a
    * content-keyed window. `dup_ratio = 1 − distinct/total` over the
    * per-doc-distinct shingle multiset (the containment convention
    * the minhash pipeline uses).
    */
  def duplicationStats(
      docs: DataFrame,
      textCol: Column,
      groupCol: String,
      w: Int = 5): DataFrame = {
    val grain = docs.select(col(groupCol), explode(shingles(textCol, w)).as("__sh"))
    val perKey = grain.groupBy(col(groupCol), col("__sh"))
      .agg(count(lit(1)).as("__n"))
    val shStats = perKey.groupBy(groupCol)
      .agg(count(lit(1)).as("distinct_shingles"), sum("__n").as("total_shingles"))
    docs.groupBy(groupCol).agg(count(lit(1)).as("n_docs"))
      .join(shStats, Seq(groupCol), "left")
      .select(col(groupCol), col("n_docs"),
        coalesce(col("total_shingles"), lit(0L)).as("total_shingles"),
        coalesce(col("distinct_shingles"), lit(0L)).as("distinct_shingles"),
        when(col("total_shingles") > 0,
          round(lit(1.0) - col("distinct_shingles") / col("total_shingles"), 4))
          .as("dup_ratio"))
  }

  /** Normalized text key: lowercase, collapse whitespace — the usual
    * "almost exact" dedup key.
    */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  // ------------------------------------------------------------------
  // Shingling + MinHash + LSH
  // ------------------------------------------------------------------

  /** w-word shingles of `text` as an array column (distinct) — the
    * native one-pass kernel ([[graft.functions.TextKernels.shingles]]),
    * bit-identical to the five-HOF Column chain it replaced
    * (split/trim → windowed `array_join` → filter → `array_distinct`;
    * parity pinned in `ShingleKernelSpec`). Docs shorter than `w`
    * words yield an empty array.
    */
  def shingles(text: Column, w: Int): Column =
    graft.functions.TextKernels.shingles(text, w)

  /** MinHash permutation modulus: the Mersenne prime 2^31 − 1 keeps
    * every `a·h + b` product in exact Long range in any engine.
    */
  val MinhashP: Long = 2147483647L

  /** 60-bit base hash of one shingle (first 15 md5 hex chars), reduced
    * mod P — computed ONCE per shingle; the per-index "permutations"
    * are cheap affine maps `(aᵢ·h + bᵢ) mod P` of it (standard
    * universal-hashing minhash). md5 keeps it engine-portable.
    */
  def shingleHash(s: Column): Column =
    pmod(conv(substring(md5(s), 1, 15), 16, 10).cast("long"), lit(MinhashP))

  /** The i-th affine permutation of a base hash. */
  def permute(h: Column, i: Int): Column =
    pmod(h * (2 * i + 1) + 1000003L * i, lit(MinhashP))

  /** The corpus reduced to `(id, sh: Array[String])` shingle sets.
    * Deliberately NOT materialized here: at 100 TB this relation is
    * corpus-sized, so callers that need it twice re-derive it over a
    * *reduced* id set (semi-join) instead of persisting it — see
    * [[minhashNearDups]].
    */
  def shingleSets(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      shingleWidth: Int): DataFrame =
    docs.select(idCol.as("id"), shingles(textCol, shingleWidth).as("sh"))

  /** MinHash signatures, distributed shape: explode shingles → hash
    * once → ONE hash-aggregate computing all `numHashes` mins (map-side
    * partial min does the heavy lifting; one shuffle on doc id).
    * Returns (id, sig_0 … sig_{n−1}).
    *
    * This deliberately avoids nested `transform(...)` lambdas per hash
    * index — lambda expressions defeat common-subexpression
    * elimination, so the array form recomputes shingling per index
    * (measured 8× slower at sf0.1).
    */
  def minhashSignatures(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      shingleWidth: Int,
      numHashes: Int): DataFrame =
    signaturesFromSets(shingleSets(docs, textCol, idCol, shingleWidth), numHashes)

  /** [[minhashSignatures]] over a pre-computed `(id, sh)` relation. */
  def signaturesFromSets(sets: DataFrame, numHashes: Int): DataFrame = {
    val exploded = sets
      .select(col("id"), explode(col("sh")).as("s"))
      .withColumn("h", shingleHash(col("s")))
    exploded
      .groupBy("id")
      .agg(
        min(permute(col("h"), 0)).as("sig_0"),
        (1 until numHashes).map(i => min(permute(col("h"), i)).as(s"sig_$i")): _*)
  }

  /** LSH band keys from signature columns: `band_index | sig | sig`.
    * Docs sharing any band key become candidates.
    */
  def bandKeyColumns(bands: Int, rows: Int): Seq[Column] =
    (0 until bands).map { b =>
      concat_ws("|", lit(b.toString) +: (0 until rows).map(r =>
        col(s"sig_${b * rows + r}")): _*)
    }

  /** MinHash-LSH candidate pairs: signatures → explode band keys →
    * self-join within buckets only (shuffle on band key — never
    * all-pairs) → distinct (a < b) pairs.
    *
    * The signature relation — tiny: `numHashes` longs per doc — is
    * materialized ([[graft.Lineage.truncate]] with `eager = false`, so
    * this remains a lazy plan builder) before the self-join: both join
    * branches would otherwise re-run the full shingle→hash→aggregate
    * pipeline — at 100 TB that is two corpus passes instead of one
    * plus a (tiny) signature-table read. Truncation is
    * executor-local by default (fine: the relation is
    * signature-sized); on a real cluster set `graft.checkpoint.dir`
    * to make every cut a reliable checkpoint that survives executor
    * loss.
    */
  def minhashCandidates(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      shingleWidth: Int = 3,
      bands: Int = 4,
      rows: Int = 2): DataFrame = {
    val sigs = minhashSignatures(docs, textCol, idCol, shingleWidth, bands * rows)
      .truncateLineage(eager = false)
    candidatesFromSignatures(sigs, bands, rows)
  }

  /** Banded self-join of an (already materialized) signature relation. */
  private def candidatesFromSignatures(sigs: DataFrame, bands: Int, rows: Int): DataFrame = {
    val keyed = sigs
      .select(col("id"), explode(array(bandKeyColumns(bands, rows): _*)).as("band"))
    val a = keyed.as("a")
    val b = keyed.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs with exact Jaccard verification of the
    * candidates (candidate generation is banded; verification joins
    * shingle sets back by id — both sides bucketed, no cartesian).
    *
    * 100 TB materialization discipline: only the *signature* relation
    * (numHashes longs per doc) is checkpointed — it feeds both branches
    * of the banded self-join, and truncating its lineage there costs
    * only signature-sized executor storage. The corpus-sized shingle
    * sets are NOT persisted anywhere: verification re-shingles only the
    * docs that appear in some candidate pair, obtained by semi-joining
    * the corpus against the distinct candidate ids. The candidate set
    * is Σ sᵢ² bucket-bounded and ≪ corpus, so the extra cost is one
    * pruned re-scan of the text column for a small fraction of rows —
    * versus pinning a corpus-scale relation in executor storage
    * (executor-local truncation dies with a lost executor; see
    * [[graft.Lineage]] for the durable mode).
    */
  def minhashNearDups(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      shingleWidth: Int = 3,
      bands: Int = 4,
      rows: Int = 2,
      threshold: Double = 0.6): DataFrame = {
    val sets = shingleSets(docs, textCol, idCol, shingleWidth)
    val sigs = signaturesFromSets(sets, bands * rows).truncateLineage(eager = false)
    val cands = candidatesFromSignatures(sigs, bands, rows)
      .truncateLineage(eager = false) // read twice: id collection + verify join
    // ids touched by any candidate pair — tiny; broadcast-joins below
    val candIds = cands.select(col("id_a").as("id"))
      .unionByName(cands.select(col("id_b").as("id")))
      .distinct()
    // re-shingle ONLY candidate docs (docs ⋉ candIds); checkpointed so
    // the a-side and b-side verify joins share one candidate-sized
    // relation instead of shingling the candidates twice
    val candSets = shingleSets(
      docs.join(candIds, idCol === col("id"), "left_semi"),
      textCol, idCol, shingleWidth)
      .truncateLineage(eager = false)
    cands
      .join(candSets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(candSets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .where(jaccardSizeBound(col("sh_a"), col("sh_b"), threshold))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))) /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 32-bit SimHash over words: per word, an md5-derived 32-bit
    * pattern votes ±1 per bit; the sign of each bit-sum forms the
    * fingerprint. Bits kept ≤ 32 so all arithmetic stays in exact
    * Long range in any engine.
    *
    * Distributed shape: explode words → hash once → ONE hash-aggregate
    * with 32 conditional sums (map-side combine; one shuffle on id) —
    * the per-bit `aggregate` lambda form recomputes the word hashing
    * per bit (32×) because lambdas defeat subexpression elimination.
    */
  def simhashDF(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      bits: Int = 32): DataFrame = {
    // the md5-per-word voting pass is the cost — spread a single-split
    // input across the session first (no-op at corpus scale)
    val words = graft.Tuning.spreadTinyInput(docs.select(idCol.as("id"), textCol.as("__t")))
      .select(col("id"), explode(split(trim(col("__t")), "\\s+")).as("w"))
      .withColumn("h", conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        .as(s"s_$b")
    }
    words.groupBy("id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until bits)
          .map(b => when(col(s"s_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp"))
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Necessary popcount condition for `hamming(a, b) <= d`: flipping
    * one bit changes the popcount by exactly ±1, so
    * `|popcount(a) − popcount(b)| <= hamming(a, b)` always — a pair
    * whose popcounts differ by more than `d` can never verify. A
    * codegen'd integer bound evaluated BEFORE the XOR-popcount (and,
    * in the banded generator, before the candidate-pair distinct),
    * same pattern as [[jaccardSizeBound]] (round-17 optimization,
    * guide §1.2 step 2: cheap necessary condition first). Never
    * sufficient — callers keep the exact Hamming filter, results
    * unchanged (`PopcountBoundSpec`).
    */
  private[llm] def popcountBound(a: Column, b: Column, d: Int): Column =
    abs(bit_count(a) - bit_count(b)) <= d

  /** SimHash near-dup candidates bucketed by the top `prefixBits` of
    * the fingerprint (a band of the simhash — bucketed join, not
    * all-pairs), verified by full hamming distance ≤ maxDistance.
    *
    * Deployment note (since round 16): the simhash family checkpoints
    * its fingerprint relation (1 long per doc), so on a
    * multi-executor deployment it follows the [[graft.Lineage]]
    * durability contract — with `graft.checkpoint.requireDurable=true`
    * and no `graft.checkpoint.dir`, these operators fail fast where
    * the pre-r16 plan-only form ran without any checkpoint.
    */
  def simhashNearDups(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      prefixBits: Int = 8,
      maxDistance: Int = 6): DataFrame =
    simhashNearDupsFromFp(
      simhashDF(docs, textCol, idCol).truncateLineage(eager = false),
      prefixBits, maxDistance)

  /** [[simhashNearDups]] over an (ideally materialized) `(id, fp)`
    * relation: both branches of the bucket self-join read the
    * fingerprint table instead of re-running the corpus-scan →
    * explode → md5 → 32-sum aggregate per branch (the same
    * signature-materialization discipline [[minhashCandidates]]
    * documents — fingerprints are 1 long per doc).
    */
  private[llm] def simhashNearDupsFromFp(
      fp0: DataFrame,
      prefixBits: Int,
      maxDistance: Int): DataFrame = {
    // popcount precomputed ONCE per row (not per pair) so the
    // per-pair necessary bound is one integer subtract/compare
    val fp = fp0.withColumn("bucket", shiftright(col("fp"), 32 - prefixBits))
      .withColumn("pc", bit_count(col("fp")))
    val a = fp.as("a")
    val b = fp.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id") &&
        abs(col("a.pc") - col("b.pc")) <= maxDistance)
      .withColumn("dist", hamming(col("a.fp"), col("b.fp")))
      .where(col("dist") <= maxDistance)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("dist"))
  }

  /** SimHash near-dup candidates over ALL `bands` disjoint fingerprint
    * bands (the dhash-family treatment applied to simhash): a pair
    * collides if ANY band matches, which by pigeonhole GUARANTEES
    * recall 1.0 for Hamming distance < `bands` and raises recall at
    * every radius over the single-prefix [[simhashNearDups]] (whose
    * one bucket loses any pair differing inside the prefix — measured
    * 0.013 recall at maxDistance 14 on sf0.01, vs 0.196 banded:
    * `d_simhash_recall` / `d_simhash_recall_banded`). Join key is
    * (band, value) — bucketed, never all-pairs; candidates verify on
    * exact Hamming like every banded family.
    */
  def simhashNearDupsBanded(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      bands: Int = 4,
      maxDistance: Int = 6,
      bits: Int = 32): DataFrame = {
    require(bits % bands == 0, s"$bits bits not divisible into $bands bands")
    simhashNearDupsBandedFromFp(
      simhashDF(docs, textCol, idCol, bits).truncateLineage(eager = false),
      bands, maxDistance, bits)
  }

  /** [[simhashNearDupsBanded]] over an (ideally materialized)
    * `(id, fp)` relation — see [[simhashNearDupsFromFp]]. */
  private[llm] def simhashNearDupsBandedFromFp(
      fp: DataFrame,
      bands: Int,
      maxDistance: Int,
      bits: Int = 32): DataFrame = {
    val w = bits / bands
    // popcount precomputed once per row; the per-pair bound then
    // prunes candidates BEFORE they cross the distinct's exchange
    val banded = fp.select(col("id"), col("fp"), bit_count(col("fp")).as("pc"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("fp"), b * w).bitwiseAND(lit((1L << w) - 1)).as("v"))): _*))
        .as("bv"))
      .select(col("id"), col("fp"), col("pc"), col("bv.band"), col("bv.v"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id") &&
          abs(col("a.pc") - col("b.pc")) <= maxDistance)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.fp"), col("b.fp")).as("dist"))
      // the Hamming filter moved BEFORE the distinct: dist is a
      // function of the pair, so filter-then-distinct ≡
      // distinct-then-filter while failing pairs no longer shuffle
      .where(col("dist") <= maxDistance)
      .distinct()
  }

  /** Precision/recall of the prefix-bucketed SimHash candidate
    * generation against blocked exact-Hamming truth — the
    * [[minhashRecall]] harness for the simhash family. Truth = all
    * same-block pairs with Hamming(fp) ≤ maxDistance; approx =
    * [[simhashNearDups]] restricted to the same blocks. Precision is
    * 1.0 by construction (candidates verify on the identical Hamming
    * bound); recall quantifies what the single-prefix bucket loses —
    * pairs whose fingerprints differ inside the top `prefixBits`.
    */
  def simhashRecall(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      bucketCols: Seq[Column],
      prefixBits: Int = 8,
      maxDistance: Int = 6,
      bands: Option[Int] = None): DataFrame = {
    val lab = docs.select(
      (bucketCols.zipWithIndex.map { case (c, i) => c.as(s"bk$i") } :+
        idCol.as("id")): _*)
    val bk = lab.columns.filter(_.startsWith("bk"))
    // ONE fingerprint materialization feeds the truth self-join AND
    // the candidate generator: the corpus-scan → explode → md5 →
    // 32-sum aggregate is the expensive pass, and the truth/approx
    // branches are separate actions (each ends in its own
    // truncation), so exchange reuse cannot share it across them —
    // without this cut the aggregate ran once per branch per side.
    // Fingerprints are 1 long per doc (signature-sized, the
    // [[minhashNearDups]] storage discipline).
    val fpBase = simhashDF(docs, textCol, idCol).truncateLineage(eager = false)
    val fp = fpBase.join(lab, Seq("id"))
    val joinCond = bk.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) &&
      col("a.id") < col("b.id")
    val truth = fp.as("a").join(fp.as("b"), joinCond)
      .where(hamming(col("a.fp"), col("b.fp")) <= maxDistance)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .truncateLineageDeferred()
    val sameBlock = bk.map(c => col(s"la.$c") === col(s"lb.$c")).reduce(_ && _)
    val cand = bands match {
      case Some(b) => simhashNearDupsBandedFromFp(fpBase, b, maxDistance)
      case None => simhashNearDupsFromFp(fpBase, prefixBits, maxDistance)
    }
    val approx = cand
      .join(lab.as("la"), col("id_a") === col("la.id"))
      .join(lab.as("lb"), col("id_b") === col("lb.id"))
      .where(sameBlock)
      .select(col("id_a"), col("id_b"))
      .truncateLineageDeferred()
    recallReport(truth, approx)
  }

  /** Shared tail of the recall harnesses: one LEFT join computes
    * n_approx and n_hit together (both pair relations are unique on
    * (id_a, id_b) by construction, so the join never multiplies
    * rows); the previous shape paid a semi-join plus two separate
    * 1-row aggregates plus an extra broadcast cross — two more
    * exchanges per harness (round-17 job-count pass).
    */
  private def recallReport(truth: DataFrame, approx: DataFrame): DataFrame = {
    val nT = truth.groupBy().agg(count(lit(1)).as("n_truth"))
    val nAH = approx
      .join(truth.withColumn("__hit", lit(1)), Seq("id_a", "id_b"), "left_outer")
      .groupBy().agg(count(lit(1)).as("n_approx"),
        count(col("__hit")).as("n_hit"))
    nT.crossJoin(nAH)
      .select(col("n_truth"), col("n_approx"), col("n_hit"),
        round(col("n_hit") / greatest(col("n_approx").cast("double"), lit(1.0)), 4)
          .as("precision"),
        round(col("n_hit") / greatest(col("n_truth").cast("double"), lit(1.0)), 4)
          .as("recall"))
  }

  // ------------------------------------------------------------------
  // n-gram Jaccard (group-bucketed)
  // ------------------------------------------------------------------

  /** Pairwise word-set Jaccard similarity within explicit buckets
    * (e.g. (lang, source)) — the "blocked" similarity join: pairs are
    * generated per bucket, never across the whole corpus.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      bucketCols: Seq[Column],
      threshold: Double): DataFrame = {
    // sort+distinct ONCE per document; the per-pair evaluation is then
    // a zero-allocation merge (SortedSetJaccard) instead of
    // array_intersect/array_union rebuilding hash sets per pair
    val prepared = docs.select(
      (bucketCols.zipWithIndex.map { case (c, i) => c.as(s"bk$i") } :+
        idCol.as("id") :+
        array_sort(array_distinct(split(trim(textCol), "\\s+"))).as("words")): _*)
    val bk = prepared.columns.filter(_.startsWith("bk"))
    val joinCond = bk.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) &&
      col("a.id") < col("b.id")
    prepared.as("a").join(prepared.as("b"), joinCond)
      // size-ratio bound first: J(A,B) ≥ t ⇒ min(|A|,|B|) ≥ t·max —
      // a codegen'd integer predicate that skips the merge kernel for
      // size-mismatched pairs; necessary condition, so the surviving
      // jaccard filter below keeps the result identical
      .where(jaccardSizeBound(col("a.words"), col("b.words"), threshold))
      .withColumn("jaccard",
        org.apache.spark.sql.GraftExpressionBridge.column(
          graft.functions.SortedSetJaccard(
            org.apache.spark.sql.GraftExpressionBridge.expression(col("a.words")),
            org.apache.spark.sql.GraftExpressionBridge.expression(col("b.words")))))
      .where(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("jaccard"), 4).as("jaccard"))
  }

  /** Necessary size condition for `jaccard(a, b) >= t`:
    * |A∩B| ≤ min(|A|,|B|) and |A∪B| ≥ max(|A|,|B|), so J ≥ t forces
    * min ≥ t·max. Evaluating this integer bound BEFORE the per-pair
    * merge kernel prunes size-mismatched pairs at codegen cost; it is
    * never sufficient, so callers keep the exact filter after it and
    * results are unchanged (round-16 optimization, guide §1.2 step 2).
    */
  private[llm] def jaccardSizeBound(a: Column, b: Column, t: Double): Column =
    least(size(a), size(b)).cast("double") >=
      lit(t) * greatest(size(a), size(b)).cast("double")

  /** Deterministic per-document rolling-hash fingerprint: the minimum
    * md5 over word 5-shingles (winnowing with window = whole doc).
    */
  def fingerprint(text: Column, w: Int = 5): Column =
    array_min(transform(shingles(text, w), s => md5(s)))

  /** Proper winnowing (Schleimer et al. 2003, "Winnowing: Local
    * Algorithms for Document Fingerprinting"): hash every k-gram IN
    * POSITION ORDER, slide a window of `w` consecutive hashes, and
    * select each window's minimum — the guarantee is that any match
    * of length ≥ k + w − 1 shares a fingerprint. The fingerprint SET
    * per document is the sorted distinct selected hashes (position
    * identity is not needed for set-overlap detection, so the
    * rightmost-min tie rule collapses to plain window minima).
    * Documents with fewer than `w` windows fall back to one whole-doc
    * window ([[fingerprint]]'s rule). One native in-row pass
    * ([[graft.functions.WinnowKernel]]: monotonic-deque window
    * minima, O(n) total — the Column-chain formulation re-evaluated
    * the md5 hash array per reference and allocated a slice per
    * window, 15.5 s → 0.4 s at sf0.1) — map-only at any corpus
    * scale.
    */
  def winnow(text: Column, k: Int = 5, w: Int = 4): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.WinnowFingerprints(
        org.apache.spark.sql.GraftExpressionBridge.expression(text), k, w))

  /** Cross-document duplicate-span statistics (ExactSubstr-lite,
    * after Lee et al. 2022 "Deduplicating Training Data Makes
    * Language Models Better"): a w-word shingle appearing in ≥2
    * documents marks a duplicated span; per document, count how many
    * of its distinct shingles are duplicated elsewhere. Plan: the
    * shingle explode runs ONCE (it is the expensive stage — w-word
    * array_join + md5 per shingle) and collapses immediately into a
    * (doc_id, h, c) aggregate with map-side partials; global shingle
    * frequency is then a second aggregate on h (again with partials,
    * so a hot boilerplate shingle arrives at the reducer as one row
    * per map partition, not one row per occurrence) joined back on h.
    * Both consumers of the (doc_id, h) aggregate hang off the SAME
    * exchange, which Catalyst dedups (ReusedExchange) — the explode
    * still runs once. Never a window over the content-hash key: a
    * window gets no partial aggregation, so the hot key would
    * serialize into a single task at corpus scale. The join's skewed
    * side carries at most one row per (doc, hot shingle) — AQE
    * skew-join splittable. Documents with NO shingles (< w words) are
    * absent from the explode and re-enter via the left join with zero
    * counts.
    */
  def duplicateSpans(
      docs: DataFrame,
      textCol: Column,
      idCol: Column = col("doc_id"),
      w: Int = 5): DataFrame = {
    // the explicit not-null (a no-op for the result: a null id never
    // matches the left join below) keeps BOTH consumers' scans
    // byte-identical — the outer join would otherwise push
    // IsNotNull(doc_id) into only one branch and break the exchange
    // reuse that makes the explode run once
    val exploded = docs
      .where(idCol.isNotNull)
      .select(idCol.as("doc_id"), explode(shingles(textCol, w)).as("s"))
      .select(col("doc_id"), shingleHash(col("s")).as("h"))
    val perDocKey = exploded.groupBy("doc_id", "h")
      .agg(count(lit(1)).as("c"))
    val byKey = perDocKey.groupBy("h").agg(sum(col("c")).as("n"))
    val perDoc = perDocKey.join(byKey, Seq("h"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_shingles"),
        sum(when(col("n") > 1, col("c")).otherwise(0L)).as("n_dup"))
    docs.select(idCol.as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        round(coalesce(col("n_dup"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_shingles"), lit(0L)).cast("double"), lit(1.0)),
          4).as("dup_ratio"))
  }

  /** Positional w-word shingles (NON-distinct, unlike [[shingles]]):
    * element j (0-based) is the shingle starting at word j, so a
    * `posexplode` yields (start, shingle) pairs directly.
    */
  /** Overlapping w-grams aligned with word positions — the native
    * one-pass kernel (parity with the HOF chain in
    * `ShingleKernelSpec`).
    */
  private def positionalShingles(words: Column, w: Int): Column =
    graft.functions.TextKernels.positionalShingles(words, w)

  /** ExactSubstr-style duplicate-span REMOVAL — the cleanup step that
    * [[duplicateSpans]]' statistics feed (Lee et al. 2022 cut the
    * repeated substrings out of the corpus, they don't just count
    * them): drop every word covered by a w-word shingle whose exact
    * text occurs more than once in the corpus (intra- or
    * inter-document), then reassemble the survivors in order.
    *
    * Plan shape at corpus scale: positional shingles explode into
    * slim (doc_id, start, h) rows; the duplicated-hash set is a hash
    * aggregate with map-side partials (never a window over the
    * content hash — the boilerplate-shingle lesson from
    * [[duplicateSpans]]); duplicate span starts fold back per
    * document via `collect_set` (bounded by document word count);
    * coverage and reassembly are a map-only array pass fused over the
    * original scan, so the corpus text itself is never shuffled.
    *
    * The explode deliberately runs TWICE (once to count, once to
    * locate) — the removal analogue of ExactSubstr's multi-pass
    * design. Unlike [[duplicateSpans]], the two consumers cannot
    * share one exchange: the locate side must carry positions that
    * the count side prunes, so Catalyst plans them apart. Recomputing
    * a map-side md5 pass scales; the alternatives do not — the
    * positional relation is corpus-words-sized (hundreds of TB at the
    * design point, too big to checkpoint per query), and collecting
    * occurrence lists per hash OOMs on the hot boilerplate shingle.
    * Word positions are 0-based end to end (`posexplode` / 2-arg
    * `filter` index).
    */
  def scrubSpans(
      docs: DataFrame,
      textCol: Column,
      idCol: Column = col("doc_id"),
      w: Int = 5): DataFrame = {
    val base = docs
      .where(idCol.isNotNull)
      .select(idCol.as("doc_id"), split(trim(textCol), "\\s+").as("ws"))
    val sh = base
      .select(col("doc_id"), posexplode(positionalShingles(col("ws"), w)))
      .select(col("doc_id"), col("pos"), md5(col("col")).as("h"))
    val dupKeys = sh.groupBy("h").agg(count(lit(1)).as("n"))
      .where(col("n") > 1).select("h")
    val dupStarts = sh.join(dupKeys, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(collect_set(col("pos")).as("starts"))
    val covered = array_distinct(flatten(transform(
      coalesce(col("starts"), array().cast("array<int>")),
      st => sequence(st, st + (w - 1)))))
    val kept = filter(col("ws"), (word, i) => !array_contains(covered, i))
    base.join(dupStarts, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        array_join(kept, " ").as("clean_text"),
        size(col("ws")).cast("long").as("n_words"),
        (size(col("ws")) - size(kept)).cast("long").as("n_removed"))
  }

  // ------------------------------------------------------------------
  // Duplicate clusters (connected components over near-dup pairs)
  // ------------------------------------------------------------------

  /** Connected components over an undirected pair relation
    * (`id_a`, `id_b`) by iterative min-label propagation: every node's
    * label converges to the smallest id in its component in
    * O(component diameter) joins. Near-dup components are tiny (dup
    * clusters), so the loop terminates in a handful of rounds; each
    * round is one shuffle on id — no driver-side graph.
    */
  /** Pair-count ceiling for the driver-side union-find shortcut in
    * [[clusters]] — ~16 bytes/pair plus index overhead, so the default
    * bounds driver memory at tens of MB. Override per session with
    * `spark.conf.set("graft.cc.localThreshold", …)`; set 0 to force
    * the distributed loop.
    */
  val CcLocalThresholdKey = "graft.cc.localThreshold"

  def clusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // truncate (not cache) per round: cuts the growing lineage so each
    // iteration's plan stays constant-size — iterative algorithms
    // otherwise pay quadratic analysis/optimization time. Durable when
    // graft.checkpoint.dir is set (a lost executor mid-loop then costs
    // a round, not the job).
    //
    // pairs is materialized BEFORE the symmetrize union: its two
    // branches would otherwise each recompute the upstream pair
    // producer (for near-dup input that is the whole candidate→Jaccard
    // verification join), and the pair relation is the small end of
    // the funnel — cheapest possible point to cut.
    // deferred: the count probe below is the first action and
    // materializes the cut — an eager cut here was one extra job on
    // every clusters() consumer (round-17 job-count pass)
    val p = pairs.select(col("id_a"), col("id_b")).truncateLineageDeferred()

    // adaptive: the VERIFIED pair relation is the small end of the
    // dedup funnel (candidates are band-bucketed and Jaccard-checked
    // before they get here), so on most corpora it fits the driver
    // with room to spare. Below the bound, a driver-side union-find
    // with min-id labeling produces EXACTLY the distributed loop's
    // fixpoint in one collect instead of ~log(diameter) rounds of
    // (2 truncate jobs + 1 convergence count) each; above it — or for
    // non-long id types — the pointer-jumping loop runs unchanged.
    // The count is against the already-materialized checkpoint, so
    // the probe costs one cheap job, not a recomputation.
    val isLong = p.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.LongType)
    val localMax = p.sparkSession.conf
      .getOption(CcLocalThresholdKey).map(_.toLong).getOrElse(1000000L)
    if (isLong && localMax > 0 && p.count() <= localMax) {
      val rows = p.collect()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        var r = parent.getOrDefault(x, x)
        while (r != x) { x = r; r = parent.getOrDefault(x, x) }
        // path compression
        var y = x0
        while (y != r) { val n = parent.getOrDefault(y, y); parent.put(y, r); y = n }
        r
      }
      rows.foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        val (ra, rb) = (find(a), find(b))
        // union by MIN id so every root is already its component's
        // minimum — the exact labeling the distributed loop converges to
        if (ra != rb) {
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val ids = new java.util.HashSet[Long]()
      rows.foreach { r => ids.add(r.getLong(0)); ids.add(r.getLong(1)) }
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](ids.size)
      ids.forEach(id => out += ((id, find(id))))
      val spark = p.sparkSession
      import spark.implicits._
      return out.toSeq.toDF("id", "cluster_id")
    }
    val edges = symmetrize(p)

    // Contraction prelude (round-14): near-dup pair relations are
    // CLIQUE-dominated — quadratic in-clique edges that carry no
    // connectivity the clique's representative doesn't — and the
    // label loop below re-reads the FULL edge relation every round
    // (the ×10 probe measured 3.3M pairs / 54 s for a graph whose
    // contracted form is a few thousand edges). One min-neighbor
    // contraction collapses it first: l1(x) = min(x, min neighbor),
    // every edge re-keyed through l1, loops dropped, duplicates
    // merged. Components and min-id labels are preserved exactly —
    // l1(x) is always a node of x's component, every original path
    // maps to a contracted path, and each component's min is an l1
    // fixpoint (its neighbors are all larger). The contracted graph
    // recurses through clusters() itself — cliques vanish in one
    // pass, and the driver union-find shortcut re-applies the moment
    // the edge count fits — but ONLY while each level halves the
    // edge count: min-neighbor hooking removes ~1 edge per level on a
    // chain-shaped backbone (l1(i) = i−1 on a path), so an
    // unconditional recurse-on-any-progress rule would recurse once
    // per removed edge — unbounded depth, three checkpoints + two
    // count jobs per level. Sub-geometric progress falls through to
    // the pointer-jumping label loop over the (still no larger)
    // contracted graph, whose round count is O(log diameter) by
    // construction.
    val l1 = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("mn"))
      .select(col("id"), least(col("id"), col("mn")).as("l1"))
      .truncateLineageDeferred()
    val cPairs = edges
      .join(l1.select(col("id").as("src"), col("l1").as("ls")), Seq("src"))
      .join(l1.select(col("id").as("dst"), col("l1").as("ld")), Seq("dst"))
      .where(col("ls") < col("ld"))
      .select(col("ls").as("id_a"), col("ld").as("id_b"))
      .distinct()
      .truncateLineageDeferred()
    val nContracted = cPairs.count()
    val nPairs = p.count()
    def compose(sub: DataFrame): DataFrame =
      l1.join(sub.withColumnRenamed("id", "l1"), Seq("l1"), "left_outer")
        .select(col("id"),
          coalesce(col("cluster_id"), col("l1")).as("cluster_id"))
    if (nContracted == 0) return compose(
      cPairs.select(col("id_a").as("id"), col("id_b").as("cluster_id")))
    if (nContracted * 2 <= nPairs) return compose(clusters(cPairs, maxIter))
    if (nContracted < nPairs)
      // sub-geometric progress: another contraction level would not
      // pay for its checkpoints — label-loop the contracted graph
      // (≤ the input's size) and compose back through l1
      return compose(labelLoop(symmetrize(cPairs), maxIter))
    // contraction made no progress (no clique/chain structure left to
    // merge at this granularity) — run the label loop directly
    labelLoop(edges, maxIter)
  }

  /** The symmetrized, deduped edge relation of an (id_a, id_b) pair
    * relation — the form [[labelLoop]] consumes.
    */
  private def symmetrize(pairs: DataFrame): DataFrame =
    pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .truncateLineageDeferred()

  /** Min-label propagation with pointer jumping over a symmetrized
    * edge relation — the distributed fallback of [[clusters]] for
    * graphs past the driver union-find bound whose contraction
    * stalled. O(log diameter) rounds, one shuffle join per round.
    */
  private def labelLoop(edges: DataFrame, maxIter: Int): DataFrame = {
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("cluster_id", col("id"))
      .truncateLineageDeferred()
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("cluster_id", "n_label"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("n_label")).as("n_min"))
      val prelim = labels.join(viaNeighbors, Seq("id"), "left_outer")
        .select(col("id"), col("cluster_id").as("old_label"),
          least(col("cluster_id"), coalesce(col("n_min"), col("cluster_id")))
            .as("mid_label"))
        .truncateLineageDeferred()
      // pointer jumping (path halving): l(id) ← l(l(id)). A label is
      // always the id of a node in the same component, so the
      // composed label stays in-component and only decreases —
      // convergence drops from O(diameter) to O(log diameter) rounds,
      // i.e. fewer shuffle jobs, the actual cost driver of the loop.
      val jumped = prelim.join(
        prelim.select(col("id").as("pid"), col("mid_label").as("p_label")),
        col("mid_label") === col("pid"), "left_outer")
        .select(col("id"), col("old_label"),
          least(col("mid_label"), coalesce(col("p_label"), col("mid_label")))
            .as("cluster_id"))
      // one action per round: materialize next labels AND the change
      // marker together (changed = any label decreased)
      val next = jumped
        .select(col("id"), col("cluster_id"),
          (col("cluster_id") < col("old_label")).as("changed"))
        .truncateLineage()
      changed = next.where(col("changed")).limit(1).count() > 0
      labels = next.select("id", "cluster_id")
      iter += 1
    }
    labels
  }

  /** Near-dup dedup end to end: cluster the verified pairs, keep the
    * min-id document of each cluster — the keep-first policy of
    * `exact`, extended to near-duplicates. Returns surviving doc ids
    * (docs in no pair survive by default).
    */
  def nearDupKeep(docs: DataFrame, pairs: DataFrame, idCol: Column = col("doc_id")): DataFrame = {
    val cl = clusters(pairs)
    val losers = cl.where(col("id") =!= col("cluster_id")).select(col("id"))
    docs.join(losers, idCol === col("id"), "left_anti")
  }

  /** Incremental near-dup ADMISSION — the ingest-time shape of
    * near-duplicate dedup at corpus scale: a batch of arrivals is
    * admitted against a store that is already near-deduplicated,
    * WITHOUT re-clustering (or, in production, even re-reading) the
    * store corpus. Complements [[dedupAgainst]] (the exact-key
    * incremental form) with the MinHash-LSH near-dup semantics of
    * [[minhashNearDups]]/[[nearDupKeep]].
    *
    * Keep-first policy, consistent with the full-corpus path:
    *   1. an arrival sharing an LSH band with ANY store doc and
    *      verifying at exact shingle-Jaccard >= threshold is rejected
    *      (the store copy wins);
    *   2. store-clean arrivals are then near-deduplicated among
    *      themselves — verified pairs → connected components → the
    *      min-id doc of each cluster survives.
    *
    * 100 TB shape: the store participates ONLY through its band index
    * (band_key, id) — a signatures-sized relation that a production
    * deployment persists at ingest (append one row per band per
    * admitted doc — [[bandIndex]], consumed by the persisted-index
    * overload below), so the store TEXT column is re-read exclusively
    * for docs that actually share a bucket with this batch (semi-join
    * on the matched ids). There is no store-store self-join anywhere:
    * the probe is an equi-join on the band key, so per-batch cost is
    * O(|arrivals| + matched buckets) — independent of store size
    * beyond the index lookup. Batch-internal dedup reuses the
    * arrival signatures (banded self-join of a batch-sized relation).
    */
  def incrementalNearDups(
      store: DataFrame,
      arrivals: DataFrame,
      textCol: Column,
      idCol: Column,
      shingleWidth: Int = 3,
      bands: Int = 4,
      rows: Int = 2,
      threshold: Double = 0.6): DataFrame = {
    // store band index derived in-query — the generic one-shot form.
    // The streaming admitter uses the overload below with an index
    // PERSISTED at ingest, so the store corpus is never rescanned.
    val storeBands = bandIndex(store, textCol, idCol, shingleWidth, bands, rows)
    incrementalNearDups(store, storeBands, arrivals, textCol, idCol,
      shingleWidth, bands, rows, threshold)
  }

  /** The `(id, band)` LSH band index of a corpus — the relation a
    * production ingest PERSISTS next to the store (one row per band
    * per doc, `bands` rows total per doc) so that admission probes
    * are pure equi-joins on `band` with no signature recomputation
    * over the store. [[graft.streaming.StreamAdmit]] appends this for
    * each admitted batch.
    */
  def bandIndex(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      shingleWidth: Int = 3,
      bands: Int = 4,
      rows: Int = 2): DataFrame =
    signaturesFromSets(shingleSets(docs, textCol, idCol, shingleWidth),
      bands * rows)
      .select(col("id"), explode(array(bandKeyColumns(bands, rows): _*)).as("band"))

  /** [[incrementalNearDups]] against a PERSISTED store band index:
    * `storeBands` is the `(id, band)` relation maintained at ingest
    * ([[bandIndex]] of every admitted batch, appended). The store
    * TEXT relation enters the plan exactly once — semi-joined down to
    * the ids that actually share a bucket with this batch — so
    * per-batch store-side cost is the index equi-join plus a
    * matched-ids text fetch, independent of store size. (The
    * one-argument form above derives the index in-query and therefore
    * pays one full store signature pass per call — fine one-shot,
    * wrong in a loop.)
    */
  def incrementalNearDups(
      store: DataFrame,
      storeBands: DataFrame,
      arrivals: DataFrame,
      textCol: Column,
      idCol: Column,
      shingleWidth: Int,
      bands: Int,
      rows: Int,
      threshold: Double): DataFrame = {
    def bandsOf(sigs: DataFrame): DataFrame =
      sigs.select(col("id"),
        explode(array(bandKeyColumns(bands, rows): _*)).as("band"))
    val arrSigs =
      signaturesFromSets(shingleSets(arrivals, textCol, idCol, shingleWidth),
        bands * rows).truncateLineage(eager = false) // probe + batch self-join
    val crossCands = bandsOf(arrSigs).as("a")
      .join(storeBands.as("s"), col("a.band") === col("s.band"))
      .select(col("a.id").as("id_a"), col("s.id").as("id_s"))
      .distinct()
      .truncateLineage(eager = false) // read twice: id collection + verify
    // verify: re-shingle ONLY matched docs on each side (semi-joins)
    val aSets = shingleSets(
      arrivals.join(crossCands.select(col("id_a").as("id")).distinct(),
        idCol === col("id"), "left_semi"), textCol, idCol, shingleWidth)
    val sSets = shingleSets(
      store.join(crossCands.select(col("id_s").as("id")).distinct(),
        idCol === col("id"), "left_semi"), textCol, idCol, shingleWidth)
    val dirty = crossCands
      .join(aSets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sSets.withColumnRenamed("id", "id_s").withColumnRenamed("sh", "sh_s"), "id_s")
      .where(jaccardSizeBound(col("sh_a"), col("sh_s"), threshold) &&
        size(array_intersect(col("sh_a"), col("sh_s"))) /
        size(array_union(col("sh_a"), col("sh_s"))).cast("double") >= threshold)
      .select(col("id_a").as("id")).distinct()
      .truncateLineage(eager = false) // gates both the sigs and the rows
    val clean = arrivals.join(dirty, idCol === col("id"), "left_anti")
    // batch-internal near-dup among store-clean arrivals, reusing the
    // already-computed signatures (anti-join instead of re-deriving)
    val cleanSigs = arrSigs.join(dirty, arrSigs("id") === dirty("id"), "left_anti")
    val batchCands = candidatesFromSignatures(cleanSigs, bands, rows)
      .truncateLineage(eager = false)
    val candIds = batchCands.select(col("id_a").as("id"))
      .unionByName(batchCands.select(col("id_b").as("id"))).distinct()
    val candSets = shingleSets(
      clean.join(candIds, idCol === col("id"), "left_semi"),
      textCol, idCol, shingleWidth)
      .truncateLineage(eager = false) // shared by both verify branches
    val verified = batchCands
      .join(candSets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(candSets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .where(jaccardSizeBound(col("sh_a"), col("sh_b"), threshold) &&
        size(array_intersect(col("sh_a"), col("sh_b"))) /
        size(array_union(col("sh_a"), col("sh_b"))).cast("double") >= threshold)
      .select(col("id_a"), col("id_b"))
    nearDupKeep(clean, verified, idCol)
  }

  /** MinHash-LSH recall harness — the dedup analog of
    * [[Similarity.recallAtK]]'s "measure, don't guess" rule: exact
    * shingle-Jaccard TRUTH pairs inside explicit blocks (the only
    * place exact truth is computable without an all-pairs stage)
    * versus the banded pipeline's verified pairs restricted to the
    * same blocks. Because [[minhashNearDups]] verifies candidates
    * with the exact Jaccard, precision is 1 by construction — the
    * number this harness exists for is RECALL, the band-miss rate
    * the (bands, rows) choice trades away (size it with [[lshPlan]]).
    * One-row report: (n_truth, n_approx, n_hit, precision, recall).
    */
  def minhashRecall(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      bucketCols: Seq[Column],
      shingleWidth: Int = 3,
      bands: Int = 4,
      rows: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val lab = docs.select(
      (bucketCols.zipWithIndex.map { case (c, i) => c.as(s"bk$i") } :+
        idCol.as("id")): _*)
    val bk = lab.columns.filter(_.startsWith("bk"))
    // per-doc sort ONCE so the per-pair truth evaluation is the
    // zero-allocation merge kernel, not a hash-set rebuild per pair
    // (set semantics — the Jaccard value is order-independent)
    val sets = shingleSets(docs, textCol, idCol, shingleWidth)
      .select(col("id"), array_sort(col("sh")).as("sh"))
      .join(lab, Seq("id"))
    val joinCond = bk.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) &&
      col("a.id") < col("b.id")
    // truth and approx are each consumed TWICE (the hit semi-join and
    // their own count row) — materialize the pair-sized relations once
    // instead of re-running the blocked join / banded pipeline per
    // consumer
    val truth = sets.as("a").join(sets.as("b"), joinCond)
      // cheap necessary size bound before the merge kernel — see
      // [[jaccardSizeBound]]; the exact filter below is unchanged
      .where(jaccardSizeBound(col("a.sh"), col("b.sh"), threshold))
      .withColumn("j",
        org.apache.spark.sql.GraftExpressionBridge.column(
          graft.functions.SortedSetJaccard(
            org.apache.spark.sql.GraftExpressionBridge.expression(col("a.sh")),
            org.apache.spark.sql.GraftExpressionBridge.expression(col("b.sh")))))
      .where(col("j") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .truncateLineageDeferred()
    val sameBlock = bk.map(c => col(s"la.$c") === col(s"lb.$c")).reduce(_ && _)
    val approx = minhashNearDups(docs, textCol, idCol, shingleWidth,
        bands, rows, threshold)
      .join(lab.as("la"), col("id_a") === col("la.id"))
      .join(lab.as("lb"), col("id_b") === col("lb.id"))
      .where(sameBlock)
      .select(col("id_a"), col("id_b"))
      .truncateLineageDeferred()
    recallReport(truth, approx)
  }

  /** Optimal LSH banding plan: among all (bands b, rows r) with
    * b·r = `nHashes`, pick the one minimizing the integrated
    * candidate error against the target Jaccard `threshold` t —
    * ∫₀ᵗ p(s) ds (false-positive mass) + ∫ₜ¹ (1 − p(s)) ds
    * (false-negative mass) with p(s) = 1 − (1 − sʳ)ᵇ, the standard
    * S-curve analysis (Mining of Massive Datasets §3.4). Driver-side
    * arithmetic over the ≤ d(n) divisor pairs — this is the knob
    * that sizes [[minhashPairs]]' Σsᵢ² candidate budget before a
    * corpus-scale run, not a per-row operator.
    *
    * Returns (bands, rows, s50, fpMass, fnMass) where
    * s50 = (1/b)^(1/r) is the curve's 50% threshold.
    */
  def lshPlan(nHashes: Int, threshold: Double): (Int, Int, Double, Double, Double) = {
    require(nHashes >= 1 && threshold > 0 && threshold < 1,
      "need nHashes >= 1 and threshold in (0,1)")
    val steps = 1000
    def pCand(s: Double, b: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, r), b)
    val plans = for {
      r <- 1 to nHashes if nHashes % r == 0
      b = nHashes / r
    } yield {
      var fp = 0.0; var fn = 0.0
      var i = 0
      while (i < steps) {
        val s = (i + 0.5) / steps
        val p = pCand(s, b, r)
        if (s < threshold) fp += p / steps else fn += (1.0 - p) / steps
        i += 1
      }
      (b, r, math.pow(1.0 / b, 1.0 / r), fp, fn)
    }
    plans.minBy(p => p._4 + p._5)
  }

  /** Boilerplate-line removal (the line-level dedup pass web-corpus
    * pipelines run before document-level dedup — cookie banners,
    * nav menus, and footers repeat VERBATIM across pages, so a line
    * whose trimmed text occurs in ≥ `minDocs` distinct documents is
    * dropped from every document). Whitespace-only lines are
    * structure, not content: they are never counted and never
    * removed. Returns `(doc_id, n_lines, n_removed, clean_text)` with
    * survivors rejoined in original order.
    *
    * Scale shape: the line explode collapses immediately into a
    * `(key, doc_id)` aggregate and then a per-key distinct-doc count —
    * both hash aggregates with map-side partials, so a footer line
    * present on 10⁹ pages arrives at its reducer as one row per map
    * partition, never one row per occurrence (the `duplicateSpans`
    * lesson: no content-keyed window anywhere). The hot-key join back
    * is AQE skew-splittable; reassembly is a per-document aggregate
    * bounded by document line count.
    */
  def dropBoilerplateLines(
      docs: DataFrame,
      textCol: Column,
      idCol: Column = col("doc_id"),
      minDocs: Int = 2): DataFrame = {
    val lines = docs
      .select(idCol.as("doc_id"), posexplode(split(textCol, "\n")).as(Seq("pos", "line")))
      .withColumn("key", trim(col("line")))
    val hot = lines.where(col("key") =!= "")
      .groupBy("key", "doc_id").agg(count(lit(1)).as("__c"))
      .groupBy("key").agg(count(lit(1)).as("nd"))
      .where(col("nd") >= minDocs)
      .select(col("key"), lit(true).as("__drop"))
    val marked = lines.join(hot, Seq("key"), "left_outer")
      .select(col("doc_id"), col("pos"), col("line"),
        coalesce(col("__drop"), lit(false)).as("drop"))
    marked.groupBy("doc_id").agg(
      count(lit(1)).as("n_lines"),
      sum(when(col("drop"), 1L).otherwise(0L)).as("n_removed"),
      coalesce(
        array_join(
          transform(
            array_sort(collect_list(
              when(!col("drop"), struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          "\n"),
        lit("")).as("clean_text"))
  }
}
