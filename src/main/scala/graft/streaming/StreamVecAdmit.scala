package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Lineage.TruncateOps
import graft.llm.{Dedup, Similarity}

/** Streaming near-dup ADMISSION for EMBEDDINGS — the third admission
  * family next to text ([[StreamAdmit]]) and media
  * ([[StreamMediaAdmit]]): each micro-batch of vectors is
  * binary-quantized ([[graft.llm.Similarity.bqEncode]] sign codes),
  * probed against the PERSISTED band index of everything admitted so
  * far, and only arrivals with no stored code within Hamming
  * `maxDist` (then keep-first within the batch) are appended.
  *
  * Semantics are EXACT in the quantized metric: the 64-bit sign code
  * splits into four 16-bit bands, so any pair within Hamming d < 4
  * shares a band (the simhash pigeonhole) — no recall loss at the
  * default `maxDist = 3`. Sign-code Hamming is itself a monotone
  * proxy for angle (1 bit ≈ one crossed hyperplane); pipelines
  * needing exact-cosine confirmation re-verify the REJECTED ids
  * against their stored twins downstream — the admission loop's
  * store-side cost must not grow with the store, and the banded
  * probe is O(|batch| + matched buckets) at any store size, like the
  * media admitter.
  */
object StreamVecAdmit {

  /** (id, b, v, lo, hi) band rows of an (id, code_lo, code_hi) sign-
    * code relation — the persisted index format. Bands are the four
    * 16-bit halves of the two 32-bit words; both full words ride
    * along so probes verify with two `bit_count(xor)` in the join.
    */
  def codeBands(codes: DataFrame): DataFrame = {
    val mask = (1L << 16) - 1L
    val slices = Seq(
      struct(lit(0).as("b"), col("code_lo").bitwiseAND(lit(mask)).as("v")),
      struct(lit(1).as("b"), shiftright(col("code_lo"), 16).as("v")),
      struct(lit(2).as("b"), col("code_hi").bitwiseAND(lit(mask)).as("v")),
      struct(lit(3).as("b"), shiftright(col("code_hi"), 16).as("v")))
    codes.select(col("id"), col("code_lo"), col("code_hi"),
      explode(array(slices: _*)).as("s"))
      .select(col("id"), col("s.b").as("b"), col("s.v").as("v"),
        col("code_lo"), col("code_hi"))
  }

  /** Admit `arrivals` (id, code_lo, code_hi) against a stored band
    * index ([[codeBands]] rows) — keep-first policy consistent with
    * the text/media admitters: store wins, then batch-internal
    * near-dups cluster (banded candidates → Hamming verify → CC) and
    * each cluster's min id survives.
    */
  def admitCodes(
      storeBands: DataFrame,
      arrivals: DataFrame,
      maxDist: Int = 3): DataFrame = {
    def hd(aLo: String, aHi: String, bLo: String, bHi: String) =
      bit_count(col(aLo).bitwiseXOR(col(bLo))) +
        bit_count(col(aHi).bitwiseXOR(col(bHi)))
    val arrBands = codeBands(arrivals)
      .truncateLineage(eager = false) // probe + batch self-join
    val dirty = arrBands.as("a")
      .join(storeBands.as("s"),
        col("a.b") === col("s.b") && col("a.v") === col("s.v"))
      .where(hd("a.code_lo", "a.code_hi", "s.code_lo", "s.code_hi") <= maxDist)
      .select(col("a.id").as("id")).distinct()
      .truncateLineage(eager = false)
    val clean = arrivals.join(dirty, Seq("id"), "left_anti")
    val cleanBands = arrBands.join(dirty, Seq("id"), "left_anti")
    val pairs = cleanBands.as("x")
      .join(cleanBands.as("y"),
        col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
          col("x.id") < col("y.id"))
      .where(hd("x.code_lo", "x.code_hi", "y.code_lo", "y.code_hi") <= maxDist)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val losers = Dedup.clusters(pairs)
      .where(col("id") =!= col("cluster_id"))
      .select(col("id").as("loser_id"))
    clean.join(losers, col("id") === col("loser_id"), "left_anti")
      .select(col("id"), col("code_lo"), col("code_hi"))
  }

  /** `foreachBatch` body over vector batches carrying (vec_id,
    * embedding): sign-encode in-plan, admit against the persisted
    * index, append the admitted codes' band rows. `readIndex()` must
    * return an empty (id, b, v, code_lo, code_hi) DataFrame before
    * the first batch; the usual `foreachBatch` replay caveat applies.
    */
  def admitter(
      readIndex: () => DataFrame,
      appendIndex: DataFrame => Unit,
      dim: Int,
      maxDist: Int = 3): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => {
      val codes = Similarity.bqEncode(batch, dim)
        .withColumnRenamed("vid", "id")
      val admitted = admitCodes(readIndex(), codes, maxDist)
      appendIndex(codeBands(admitted))
    }
}
