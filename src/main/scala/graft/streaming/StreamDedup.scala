package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Streaming exact deduplication for a document ingestion pipeline —
  * the streaming twin of the batch `Dedup.exact`/`exactKeep`
  * operators: first occurrence of a content key wins, later copies
  * are dropped.
  *
  * Built on `dropDuplicatesWithinWatermark` (no custom state code):
  * the state store keeps ONE entry per distinct key first seen within
  * the watermark horizon and evicts it as the watermark passes, so
  * state is O(arrival rate × lateness window) — independent of corpus
  * size, the property that matters on an unbounded 100 TB/day feed.
  * The declared trade (same as the operator's contract upstream): a
  * duplicate arriving later than `lateness` after its first copy may
  * be emitted again; exact global dedup over all history is the batch
  * operator's job (run `Dedup.exact` over the compacted store), the
  * stream stage exists to cut the write volume near the source.
  */
object StreamDedup {

  /** Drop re-arrivals of the same content key within the watermark
    * horizon. `docs` must carry the `eventTime` timestamp column;
    * rows keep their full schema plus the derived `content_hash`.
    */
  def firstSeen(
      docs: DataFrame,
      key: Column,
      eventTime: String = "event_time",
      lateness: String = "10 minutes"): DataFrame =
    docs.withColumn("content_hash", key)
      .withWatermark(eventTime, lateness)
      .dropDuplicatesWithinWatermark("content_hash")

  /** [[firstSeen]] keyed on the md5 of whitespace/case-normalized
    * text — the streaming form of `Dedup.exactNormalized`.
    */
  def firstSeenNormalized(
      docs: DataFrame,
      text: Column,
      eventTime: String = "event_time",
      lateness: String = "10 minutes"): DataFrame =
    firstSeen(docs, md5(Dedup.normalizedText(text)), eventTime, lateness)
}
