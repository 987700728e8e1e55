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
  * Scale: [[admitterIndexed]] is the production shape — the `(id,
  * band)` LSH index is PERSISTED next to the store and appended per
  * batch, so per-batch store-side work is one equi-join probe of the
  * index plus a text fetch for matched ids: O(|batch| + matched
  * buckets), independent of store size. [[admitter]] (no index
  * tables) re-derives the store's signatures from raw text every
  * batch — O(|store|) per trigger, kept only as the zero-setup form
  * for small stores and tests.
  */
object StreamAdmit {

  /** `foreachBatch` body: admit `batch` against `readStore()` (which
    * must return an empty DataFrame with the right schema when the
    * store does not exist yet) and hand the admitted rows to
    * `appendStore`. Exposed as a function value for
    * `writeStream.foreachBatch(StreamAdmit.admitter(...))`.
    *
    * Store-side cost grows with the store (signature recomputation
    * per batch) — use [[admitterIndexed]] beyond toy stores.
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

  /** The production admitter: maintains the persisted `(id, band)`
    * LSH index next to the store. Per batch: probe the index
    * ([[graft.llm.Dedup.incrementalNearDups]] persisted-index
    * overload — store text is only fetched for ids sharing a bucket
    * with the batch), append the admitted rows, then append their
    * [[graft.llm.Dedup.bandIndex]] rows (batch-sized recompute). The
    * admitted batch is cached across the two appends so the admission
    * plan runs once.
    *
    * `readIndex()` must return an empty `(id, band)` DataFrame before
    * the first batch. Like every `foreachBatch` appender, a batch
    * replay after a failure between the two appends can leave the
    * index one batch behind the store (or duplicated) — on restart,
    * rebuild the tail of the index from the store delta, or run
    * appends through an atomic table format.
    */
  def admitterIndexed(
      textCol: Column,
      idCol: Column,
      readStore: () => DataFrame,
      appendStore: DataFrame => Unit,
      readIndex: () => DataFrame,
      appendIndex: DataFrame => Unit,
      shingleWidth: Int = 3,
      bands: Int = 4,
      rows: Int = 2,
      threshold: Double = 0.6): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => {
      val admitted = Dedup.incrementalNearDups(
        readStore(), readIndex(), batch.drop("event_time"), textCol, idCol,
        shingleWidth, bands, rows, threshold).persist()
      try {
        appendStore(admitted)
        appendIndex(Dedup.bandIndex(
          admitted, textCol, idCol, shingleWidth, bands, rows))
      } finally admitted.unpersist()
    }

  /** EXACTLY-ONCE variant of [[admitterIndexed]] over plain parquet:
    * each batch writes its admitted rows (and their index rows) to a
    * `batch_id=<id>` partition with OVERWRITE semantics, and admission
    * reads the store/index EXCLUDING the current batch's partition.
    * Structured Streaming replays a failed batch with the SAME
    * batchId, so a crash anywhere between (or inside) the two writes
    * is healed by the replay overwriting its own partitions —
    * [[admitterIndexed]]'s documented replay caveat (index one batch
    * behind, or rows duplicated) cannot occur. No atomic table format
    * needed: the partition directory IS the idempotency key, and
    * excluding it from the read makes the replayed admission
    * byte-deterministic regardless of how far the failed attempt got.
    *
    * Same scale shape as [[admitterIndexed]]: the store text relation
    * is probed via the persisted index, never signature-rescanned;
    * the `batch_id` partition column prunes at the scan.
    */
  def admitterIndexedIdempotent(
      textCol: Column,
      idCol: Column,
      storeDir: String,
      indexDir: String,
      shingleWidth: Int = 3,
      bands: Int = 4,
      rows: Int = 2,
      threshold: Double = 0.6): (DataFrame, Long) => Unit =
    (batch0: DataFrame, batchId: Long) => {
      import org.apache.spark.sql.functions.col
      val batch = batch0.drop("event_time")
      val spark = batch.sparkSession
      // Existence must resolve through the store's OWN filesystem
      // (hdfs://, s3a://, ...), not the driver's local FS — a
      // java.io.File probe is always false for remote stores and
      // would silently admit every near-duplicate.
      def readPart(dir: String, empty: => DataFrame): DataFrame = {
        val path = new org.apache.hadoop.fs.Path(dir)
        val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(path))
          spark.read.parquet(dir)
            .where(col("batch_id") =!= batchId) // replay: pre-batch view
            .drop("batch_id")
        else empty
      }
      val store = readPart(storeDir, batch.limit(0))
      // First-batch empty index: derive the schema from the batch via
      // the real bandIndex plan so `id` carries idCol's actual type
      // (hardcoding (Long, String) would make non-long ids join
      // against a mistyped probe side).
      val index = readPart(indexDir,
        Dedup.bandIndex(batch.limit(0), textCol, idCol,
          shingleWidth, bands, rows))
      val admitted = Dedup.incrementalNearDups(
        store, index, batch, textCol, idCol,
        shingleWidth, bands, rows, threshold).persist()
      try {
        admitted.write.mode("overwrite")
          .parquet(s"$storeDir/batch_id=$batchId")
        Dedup.bandIndex(admitted, textCol, idCol, shingleWidth, bands, rows)
          .write.mode("overwrite")
          .parquet(s"$indexDir/batch_id=$batchId")
      } finally admitted.unpersist()
    }
}
