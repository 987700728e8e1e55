package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Lineage.TruncateOps
import graft.llm.Multimodal

/** Streaming near-dup ADMISSION for MEDIA — the fingerprint twin of
  * [[StreamAdmit.admitterIndexed]]: each micro-batch of images is
  * dHashed, probed against the PERSISTED band index of everything
  * admitted so far, and only arrivals with no stored fingerprint
  * within `maxDist` (then keep-first within the batch) are appended —
  * the admitted set stays perceptually-near-duplicate-free by
  * construction.
  *
  * Simpler than text admission in one structural way: the fingerprint
  * IS the verifiable content, so the index rows carry `fp` and a
  * probe verifies with one `bit_count(xor)` against the matched row —
  * there is no second store access to re-fetch matched documents.
  * Per-batch store-side cost is the banded equi-join probe:
  * O(|batch| + matched buckets), independent of store size.
  */
object StreamMediaAdmit {

  /** (id, b, v, fp) band rows of an (id, fp) fingerprint relation —
    * the persisted index format. `fp` rides along so probes verify in
    * the join itself.
    */
  def fpBands(fps: DataFrame, nBits: Int = 56, bands: Int = 4): DataFrame = {
    val slices = Multimodal.fpBandSlices(col("fp"), nBits, bands)
    fps.select(col("id"), col("fp"), explode(array(slices: _*)).as("s"))
      .select(col("id"), col("s.b").as("b"), col("s.v").as("v"), col("fp"))
  }

  /** Admit `arrivals` (id, fp) against a stored band index
    * ([[fpBands]] rows): keep-first policy consistent with
    * [[graft.llm.Dedup.incrementalNearDups]] —
    *  1. an arrival within `maxDist` of ANY stored fingerprint is
    *     rejected (the store copy wins);
    *  2. store-clean arrivals near-dup-cluster among themselves
    *     (banded candidates → exact Hamming verify → connected
    *     components) and the min-id of each cluster survives.
    */
  def admitFps(
      storeBands: DataFrame,
      arrivals: DataFrame,
      nBits: Int = 56,
      bands: Int = 4,
      maxDist: Int = 10): DataFrame = {
    val arrBands = fpBands(arrivals, nBits, bands)
      .truncateLineage(eager = false) // probe + batch self-join
    BandedAdmit.admit(storeBands, arrivals, arrBands,
      (l, r) => bit_count(col(s"$l.fp").bitwiseXOR(col(s"$r.fp"))) <= maxDist)
      .select(col("id"), col("fp"))
  }

  /** `foreachBatch` body over image batches carrying (doc_id,
    * payload): dHash the batch ([[graft.llm.Multimodal.dhash]] — real
    * decode, payloads never leave their partition), admit against the
    * persisted index, append the admitted fingerprints' band rows.
    * The index IS the store here; callers wanting the payloads too
    * append them keyed on the admitted ids. `readIndex()` must return
    * an empty (id, b, v, fp) DataFrame before the first batch. The
    * usual `foreachBatch` replay caveat applies (append-once per
    * epoch or an atomic table format).
    */
  def admitter(
      readIndex: () => DataFrame,
      appendIndex: DataFrame => Unit,
      nBits: Int = 56,
      bands: Int = 4,
      maxDist: Int = 10): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => {
      val fps = Multimodal.dhash(batch.select(col("doc_id"), col("payload")))
        .withColumnRenamed("doc_id", "id")
      val admitted = admitFps(readIndex(), fps, nBits, bands, maxDist)
      appendIndex(fpBands(admitted, nBits, bands))
    }
}
