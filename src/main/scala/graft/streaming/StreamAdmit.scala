package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.llm.Dedup

/** Streaming near-dup ADMISSION — the ingest loop around
  * [[graft.llm.Dedup.incrementalNearDups]]: each micro-batch is
  * admitted against the store accumulated so far, and only admitted
  * rows are appended, so the store stays near-duplicate-free by
  * construction without ever re-clustering it.
  *
  * Division of labor in the streaming family:
  *   - [[StreamDedup]]/[[StreamCurate]] suppress duplicates WITHIN the
  *     watermark horizon (state bounded by rate × lateness);
  *   - [[StreamNearDup]] flags near-dup candidates within the horizon;
  *   - this admitter enforces the FULL-HISTORY near-dup invariant at
  *     the write boundary, holding no streaming state at all — the
  *     store's band index IS the state, and it lives in the table.
  *
  * Scale: per batch, the store side contributes one signature pass in
  * this generic form; a production deployment persists the band index
  * alongside the store (append admitted docs' bands each batch) and
  * passes a reader that serves `(band, id)` directly — the
  * [[graft.llm.Dedup.incrementalNearDups]] probe is an equi-join on
  * the band key either way, with no store-store self-join. Batch cost
  * is O(|batch| + matched buckets).
  */
object StreamAdmit {

  /** `foreachBatch` body: admit `batch` against `readStore()` (which
    * must return an empty DataFrame with the right schema when the
    * store does not exist yet) and hand the admitted rows to
    * `appendStore`. Exposed as a function value for
    * `writeStream.foreachBatch(StreamAdmit.admitter(...))`.
    */
  def admitter(
      textCol: Column,
      idCol: Column,
      readStore: () => DataFrame,
      appendStore: DataFrame => Unit,
      shingleWidth: Int = 3,
      bands: Int = 4,
      rows: Int = 2,
      threshold: Double = 0.6): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => {
      val admitted = Dedup.incrementalNearDups(
        readStore(), batch.drop("event_time"), textCol, idCol,
        shingleWidth, bands, rows, threshold)
      appendStore(admitted)
    }
}
