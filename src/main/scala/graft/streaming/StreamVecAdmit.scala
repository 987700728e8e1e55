package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Lineage.TruncateOps
import graft.llm.Similarity

/** Streaming near-dup ADMISSION for EMBEDDINGS — the third admission
  * family next to text ([[StreamAdmit]]) and media
  * ([[StreamMediaAdmit]]): each micro-batch of vectors is
  * binary-quantized ([[graft.llm.Similarity.bqEncode]] sign codes),
  * probed against the PERSISTED band index of everything admitted so
  * far, and only arrivals with no stored code within Hamming
  * `maxDist` (then keep-first within the batch) are appended.
  *
  * Semantics are EXACT in the quantized metric: the dim-bit sign
  * code splits into four dim/4-bit bands, so any pair within Hamming
  * d < 4 shares a band (the simhash pigeonhole) — no recall loss at
  * the default `maxDist = 3`. Sign-code Hamming is itself a monotone
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
    * `dim/4`-bit quarters of the code (two per `dim/2`-bit word), so
    * the band width scales WITH the dimensionality: a fixed 16-bit
    * split would leave the high bands structurally zero for dim < 64
    * and the probe would degenerate to |batch|×|store| in one hot
    * bucket. Both full words ride along so probes verify with two
    * `bit_count(xor)` in the join.
    */
  def codeBands(codes: DataFrame, dim: Int = 64): DataFrame = {
    require(dim % 4 == 0, "dim must split into 4 bands")
    val bw = dim / 4
    val mask = (1L << bw) - 1L
    val slices = Seq(
      struct(lit(0).as("b"), col("code_lo").bitwiseAND(lit(mask)).as("v")),
      struct(lit(1).as("b"), shiftright(col("code_lo"), bw).as("v")),
      struct(lit(2).as("b"), col("code_hi").bitwiseAND(lit(mask)).as("v")),
      struct(lit(3).as("b"), shiftright(col("code_hi"), bw).as("v")))
    codes.select(col("id"), col("code_lo"), col("code_hi"),
      explode(array(slices: _*)).as("s"))
      .select(col("id"), col("s.b").as("b"), col("s.v").as("v"),
        col("code_lo"), col("code_hi"))
  }

  /** Admit `arrivals` (id, code_lo, code_hi) against a stored band
    * index ([[codeBands]] rows) — keep-first policy consistent with
    * the text/media admitters (the shared [[BandedAdmit]] pipeline):
    * store wins, then batch-internal near-dups cluster and each
    * cluster's min id survives.
    */
  def admitCodes(
      storeBands: DataFrame,
      arrivals: DataFrame,
      dim: Int = 64,
      maxDist: Int = 3): DataFrame = {
    val arrBands = codeBands(arrivals, dim)
      .truncateLineage(eager = false) // probe + batch self-join
    BandedAdmit.admit(storeBands, arrivals, arrBands,
      (l, r) =>
        (bit_count(col(s"$l.code_lo").bitwiseXOR(col(s"$r.code_lo"))) +
          bit_count(col(s"$l.code_hi").bitwiseXOR(col(s"$r.code_hi")))) <= maxDist)
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
      val admitted = admitCodes(readIndex(), codes, dim, maxDist)
      appendIndex(codeBands(admitted, dim))
    }
}
