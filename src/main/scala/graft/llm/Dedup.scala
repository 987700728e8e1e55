package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Normalized text key: lowercase, collapse whitespace — the usual
    * "almost exact" dedup key.
    */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  // ------------------------------------------------------------------
  // Shingling + MinHash + LSH
  // ------------------------------------------------------------------

  /** w-word shingles of `text` as an array column (distinct). */
  def shingles(text: Column, w: Int): Column = {
    val words = split(text, "\\s+")
    array_distinct(
      filter(
        transform(
          sequence(lit(1), greatest(size(words) - (w - 1), lit(0))),
          i => array_join(slice(words, i, lit(w)), " ")),
        s => s =!= ""))
  }

  /** One MinHash signature value: `min over shingles of md5(i || ':' || s)`
    * — the lexicographic min of hex digests is a valid min-hash (the
    * digest is a uniform permutation of shingle space; independent
    * per index `i`). Portable across engines, no RNG state.
    */
  def minhash(shinglesCol: Column, i: Int): Column =
    array_min(transform(shinglesCol, s => md5(concat(lit(s"$i:"), s))))

  /** MinHash signature of `numHashes` values as an array column. */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i => minhash(shinglesCol, i)): _*)

  /** LSH band keys: the signature split into `bands` bands of `rows`
    * values each; each band key is `band_index || joined band slice`.
    * Docs sharing any band key become candidates.
    */
  def bandKeys(signature: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      concat_ws("|", lit(b.toString) +: (0 until rows).map(r =>
        element_at(signature, b * rows + r + 1)): _*)
    }: _*)

  /** MinHash-LSH candidate pairs: explode band keys, self-join within
    * buckets only (shuffle on band key — never all-pairs), distinct
    * (a < b) pairs. `bands × rows` must equal the signature length.
    */
  def minhashCandidates(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      shingleWidth: Int = 3,
      bands: Int = 4,
      rows: Int = 2): DataFrame = {
    val sig = minhashSignature(shingles(textCol, shingleWidth), bands * rows)
    val keyed = docs
      .select(idCol.as("id"), explode(bandKeys(sig, bands, rows)).as("band"))
      .distinct()
    val a = keyed.as("a")
    val b = keyed.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs with exact Jaccard verification of the
    * candidates (candidate generation is banded; verification joins
    * shingle sets back by id — both sides bucketed, no cartesian).
    */
  def minhashNearDups(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      shingleWidth: Int = 3,
      bands: Int = 4,
      rows: Int = 2,
      threshold: Double = 0.6): DataFrame = {
    val cands = minhashCandidates(docs, textCol, idCol, shingleWidth, bands, rows)
    val sets = docs.select(idCol.as("id"), shingles(textCol, shingleWidth).as("sh"))
    cands
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
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
    */
  def simhash(text: Column, bits: Int = 32): Column = {
    // hash each word once (32-bit value from the first 8 hex chars of
    // md5), then take 32 integer bit-votes over the hashed array
    val hashes = transform(split(text, "\\s+"),
      w => conv(substring(md5(w), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until bits).map { b =>
      aggregate(
        hashes,
        lit(0L),
        (acc, h) =>
          acc + when(shiftright(h, b).bitwiseAND(1) === 1, lit(1L)).otherwise(lit(-1L)))
    }
    bitSums.zipWithIndex
      .map { case (s, b) => when(s > 0, lit(1L << b)).otherwise(lit(0L)) }
      .reduce(_ + _)
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates bucketed by the top `prefixBits` of
    * the fingerprint (a band of the simhash — bucketed join, not
    * all-pairs), verified by full hamming distance ≤ maxDistance.
    */
  def simhashNearDups(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      prefixBits: Int = 8,
      maxDistance: Int = 6): DataFrame = {
    val fp = docs.select(idCol.as("id"), simhash(textCol).as("fp"))
      .withColumn("bucket", shiftright(col("fp"), 32 - prefixBits))
    val a = fp.as("a")
    val b = fp.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("dist", hamming(col("a.fp"), col("b.fp")))
      .where(col("dist") <= maxDistance)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("dist"))
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
    val prepared = docs.select(
      (bucketCols.zipWithIndex.map { case (c, i) => c.as(s"bk$i") } :+
        idCol.as("id") :+
        array_distinct(split(textCol, "\\s+")).as("words")): _*)
    val bk = prepared.columns.filter(_.startsWith("bk"))
    val joinCond = bk.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) &&
      col("a.id") < col("b.id")
    prepared.as("a").join(prepared.as("b"), joinCond)
      .withColumn("jaccard",
        size(array_intersect(col("a.words"), col("b.words"))) /
          size(array_union(col("a.words"), col("b.words"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("jaccard"), 4).as("jaccard"))
  }

  /** Deterministic per-document rolling-hash fingerprint: the minimum
    * md5 over word 5-shingles (winnowing with window = whole doc).
    */
  def fingerprint(text: Column, w: Int = 5): Column =
    array_min(transform(shingles(text, w), s => md5(s)))

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
  def clusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("cluster_id", col("id"))
      .cache()
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("cluster_id", "n_label"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("n_label")).as("n_min"))
      val next = labels.join(viaNeighbors, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("n_min"), col("cluster_id")))
            .as("cluster_id"))
        .cache()
      changed = next.join(labels.withColumnRenamed("cluster_id", "old"), Seq("id"))
        .where(col("cluster_id") =!= col("old"))
        .limit(1).count() > 0
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
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
}
