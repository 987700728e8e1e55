package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency and cardinality sketches as plain declarative
  * aggregates: Count-Min (Cormode & Muthukrishnan 2005, "An improved
  * data stream summary: the count-min sketch and its applications")
  * and HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007).
  *
  * Both are the fixed-size answer to questions the exact operators
  * ([[TopK.topKBy]], `COUNT(DISTINCT …)`) answer with a
  * key-cardinality-bound shuffle:
  *
  *  - the CM sketch folds any number of (key, +1) observations into a
  *    depth×width counter grid — here literally a
  *    `groupBy(row, bucket).count()` whose group-key cardinality is
  *    d·w REGARDLESS of the key cardinality, so Spark's partial
  *    aggregation does all the reduction map-side and the shuffle
  *    carries ≤ d·w rows per partition at 100 TB exactly as at 60 k
  *    rows; point queries then join a `broadcast()` of the grid;
  *  - the HLL register table is `groupBy(group, bucket).max(rho)` —
  *    ≤ m rows per group, merged by `max` (idempotent, commutative,
  *    associative), so partial aggregation again bounds the shuffle
  *    and the same register relation is reusable across time ranges
  *    by a further `max` (sketch union ≡ register-wise max).
  *
  * Everything is deterministic arithmetic over the repo's
  * engine-portable md5 base hash (same spelling as
  * `Dedup.shingleHash`), which is what lets the driver's DuckDB
  * oracle replay sketch contents, point estimates and cardinality
  * estimates bit-for-bit — there is no RNG anywhere.
  *
  * Determinism note on the HLL estimator: the harmonic-mean term
  * Σ 2^(−M_j) is accumulated as the INTEGER Σ 2^(26−M_j) (every term
  * a whole number because ρ ≤ 26), so the distributed sum is exact
  * and associative; the only floating-point steps are one division
  * and (in the small-range branch) one `ln`, both on identical
  * operands in either engine.
  */
object Sketches {

  /** Prime modulus shared with the minhash family (2³¹ − 1). */
  val P: Long = 2147483647L

  /** 60-bit md5 base hash mod P of the key rendered as a string —
    * the repo's engine-portable hash. DuckDB twin:
    * `('0x' || substr(md5(k::varchar), 1, 15))::bigint % 2147483647`.
    */
  def baseHash(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"), lit(P))

  /** Row-i CM bucket of base hash `h`: the same affine permutation
    * family the minhash signatures use, reduced mod `width`. All
    * operands stay well under 2⁶³ (h < 2³¹, i small), so plain `%`
    * on non-negatives matches `pmod` in any engine.
    */
  private def cmsBucket(h: Column, i: Int, width: Int): Column =
    pmod(pmod(h * (2 * i + 1) + 1000003L * i, lit(P)), lit(width.toLong))

  /** One (row, bucket) cell per sketch row per input observation —
    * the shared projection both the batch aggregate and the streaming
    * keyed state fold over ([[graft.streaming.StreamSketch]]). Null
    * keys carry no information and are dropped, matching the oracle
    * twin's `WHERE key IS NOT NULL`.
    */
  def cmsCells(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "cms needs depth >= 1, width >= 2")
    val h = baseHash(key)
    val cells = (0 until depth).map(i =>
      struct(lit(i.toLong).as("row"), cmsBucket(h, i, width).as("bucket")))
    df.where(key.isNotNull)
      .select(explode(array(cells: _*)).as("c"))
      .select(col("c.row").as("row"), col("c.bucket").as("bucket"))
  }

  /** The Count-Min counter grid over `key` occurrences: one row per
    * non-empty (row, bucket) cell. Group-key cardinality is d·w, so
    * this is a map-side-combined aggregate with a ≤ d·w-row shuffle
    * no matter the corpus size.
    */
  def cmsSketch(df: DataFrame, key: Column, depth: Int = 4, width: Int = 32): DataFrame =
    cmsCells(df, key, depth, width).groupBy("row", "bucket").agg(count(lit(1)).as("n"))

  /** Point-query evaluation harness: for EVERY distinct key, the CM
    * estimate `est = min_i grid[i][bucket_i(key)]` next to the exact
    * count and the (always ≥ 0) `overcount`. The sketch side is
    * `broadcast()` (≤ d·w rows); the exact side is the evaluation
    * baseline a production point-query would not compute — callers
    * serving lookups join probe keys against the broadcast grid
    * alone. CMS guarantee surfaced here: `overcount >= 0` always
    * (one-sided error), and `overcount ≤ (N − exact) / width` in
    * expectation per row, minimized over `depth` rows.
    */
  def cmsEstimates(df: DataFrame, key: Column, depth: Int = 4, width: Int = 32): DataFrame = {
    val sketch = cmsSketch(df, key, depth, width)
    val keys = df.where(key.isNotNull)
      .groupBy(key.cast("string").as("key")).agg(count(lit(1)).as("exact"))
    val h = baseHash(col("key"))
    val cells = (0 until depth).map(i =>
      struct(lit(i.toLong).as("row"), cmsBucket(h, i, width).as("bucket")))
    keys
      .select(col("key"), col("exact"), explode(array(cells: _*)).as("c"))
      .join(
        broadcast(sketch),
        col("c.row") === sketch("row") && col("c.bucket") === sketch("bucket"))
      .groupBy(col("key"), col("exact"))
      .agg(min(col("n")).as("est"))
      .select(col("key"), col("exact"), col("est"), (col("est") - col("exact")).as("overcount"))
  }

  /** Per-observation HLL (group, bucket, rho): bucket is the low `b`
    * bits of the base hash, ρ the 1-based position of the lowest set
    * bit of the remaining 31−b bits (capped at 32−b when they are all
    * zero). The bit trick `bit_count((x & -x) − 1)` counts trailing
    * zeros with pure integer ops both engines share.
    */
  def hllObservations(df: DataFrame, group: Column, key: Column, b: Int = 6): DataFrame = {
    require(b >= 2 && b <= 16, "hll needs 2 <= b <= 16")
    val m = 1 << b
    val cap = 32 - b // rest has 31-b significant bits; all-zero -> cap
    val h = baseHash(key)
    val rest = shiftright(h, b)
    val rho = when(rest === 0L, lit(cap.toLong))
      .otherwise(bit_count(rest.bitwiseAND(negate(rest)) - 1).cast("long") + 1L)
    df.where(key.isNotNull)
      .select(group.as("g"), (h.bitwiseAND(lit((m - 1).toLong))).as("bucket"), rho.as("rho"))
  }

  /** The HLL register table: max ρ per (group, bucket). Union of two
    * sketches of disjoint (or overlapping!) inputs is the
    * register-wise max — the property [[graft.streaming.StreamSketch]]
    * leans on and `SketchesSpec` pins.
    */
  def hllRegisters(df: DataFrame, group: Column, key: Column, b: Int = 6): DataFrame =
    hllObservations(df, group, key, b).groupBy("g", "bucket").agg(max("rho").as("reg"))

  /** Distinct set-bit positions of a Bloom filter (Bloom 1970) over
    * `key`: `numHashes` positions per key from the same md5-affine
    * family, `array_distinct`-ed by the aggregate — the relation is
    * bounded by `bits` rows REGARDLESS of key cardinality, so the
    * build is a map-side-combined distinct with a ≤ `bits`-row
    * shuffle, and the whole filter is `broadcast()`-sized. This is
    * the membership sketch behind runtime semi-join pruning: ship
    * the filter to the fact-table scan and drop rows whose key can't
    * be in the dimension — no false negatives, tunable false-positive
    * rate ≈ fill^k.
    */
  def bloomBits(df: DataFrame, key: Column, numHashes: Int = 5, bits: Int = 512): DataFrame = {
    require(numHashes >= 1 && bits >= 2, "bloom needs numHashes >= 1, bits >= 2")
    cmsCells(df, key, numHashes, bits).select(col("bucket").as("pos")).distinct()
  }

  /** The production wire format of [[bloomBits]]: positions packed
    * into 32-bit words (32, not 64, so the per-word value stays
    * strictly inside BIGINT in every engine — a 1<<63 overflows
    * DuckDB's checked shift). `bits/32` rows, reassembled into a flat
    * bitmap by any consumer. `sum` ≡ `bit_or` here because the input
    * positions are distinct, so every bit contributes at most once.
    */
  def bloomWords(bloomBits: DataFrame): DataFrame =
    bloomBits
      .groupBy((col("pos") / 32).cast("long").as("word_idx"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")).as("bits"))

  /** Membership probe of every distinct probe key against a (tiny,
    * broadcast) [[bloomBits]] relation: `maybe` is true iff ALL
    * `numHashes` positions are set. The Bloom guarantee — a key that
    * was fed to the build side is ALWAYS `maybe = true` — is what a
    * caller relies on when using `maybe` as a pre-filter; the
    * false-positive fraction among absent keys is the deterministic
    * (hash-fixed) remainder the spec measures.
    */
  def bloomProbe(
      bloomBits: DataFrame,
      probes: DataFrame,
      key: Column,
      numHashes: Int = 5,
      bits: Int = 512): DataFrame = {
    val keyed = probes.where(key.isNotNull)
      .select(key.cast("string").as("key")).distinct()
    val h = baseHash(col("key"))
    val cells = (0 until numHashes).map(i => cmsBucket(h, i, bits))
    keyed
      .select(col("key"), explode(array(cells: _*)).as("pos"))
      .join(
        broadcast(bloomBits.select(col("pos").as("set_pos"))),
        col("pos") === col("set_pos"), "left")
      .groupBy("key")
      .agg((count(col("set_pos")) === numHashes).as("maybe"))
  }

  /** Per-group HLL cardinality estimate from the register table, with
    * the standard small-range (linear-counting) correction. `exact`
    * via a COUNT(DISTINCT) next to it is the evaluation harness —
    * production readers use the registers alone.
    *
    * Empty buckets never materialize as rows, so S and V fold them in
    * arithmetically: S = Σ_present 2^(26−reg) + (m − present)·2^26
    * (for b = 6), V = m − present.
    */
  def hllDistinct(registers: DataFrame, b: Int = 6): DataFrame = {
    val m = 1 << b
    val cap = 32 - b
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val unit = 1L << cap // 2^cap: the exact-integer scaling of 2^-reg
    val agg = registers.groupBy("g").agg(
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($cap - reg AS INT))")).as("s_present"),
      count(lit(1)).as("n_present"))
    val s = (col("s_present") + (lit(m.toLong) - col("n_present")) * lit(unit)).cast("double")
    val v = (lit(m.toLong) - col("n_present")).cast("double")
    val raw = lit(alpha * m.toDouble * m.toDouble * unit.toDouble) / s
    val est = when(raw <= lit(2.5 * m) && v > 0.0,
      lit(m.toDouble) * log(lit(m.toDouble) / v)).otherwise(raw)
    agg.select(col("g"), (round(est, 4) + 0.0).as("est_distinct"))
  }
}
