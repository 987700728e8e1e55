package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.TextStats

/** Streaming corpus curation — the ingest-side composition of the
  * batch curation operators (quality gate → enrichment → exact
  * dedup), for running AT the firehose instead of after it lands:
  * dropping junk and near-source duplicates before the write cuts
  * storage and downstream batch-dedup volume where it is cheapest.
  *
  * Plan shape (streaming-legal by construction): the quality gate and
  * the language/token enrichment are narrow map-only expressions over
  * the micro-batch (the [[graft.llm.TextStats]] kernels — no
  * aggregation before the stateful stage), and the only stateful
  * operator is `dropDuplicatesWithinWatermark`, whose state is
  * O(arrival rate × lateness) — independent of corpus size. The
  * full-history guarantee stays the batch pipeline's job
  * ([[graft.llm.Pipeline]] over the compacted store); this stage
  * exists to cut write volume near the source, the same contract as
  * [[StreamDedup]].
  */
object StreamCurate {

  /** Gate, enrich, and first-seen-dedup a document stream. `docs`
    * must carry the `eventTime` timestamp column. Output keeps the
    * input schema plus `p_quality`, `lang`, `n_tokens`, and the
    * dedup's `content_hash`.
    */
  def pipeline(
      docs: DataFrame,
      textCol: Column,
      eventTime: String = "event_time",
      lateness: String = "10 minutes",
      minQuality: Double = 0.5): DataFrame = {
    val scored = docs
      .withColumn("p_quality", round(TextStats.qualityProbability(textCol), 4))
      // gate on the unrounded probability (the boundary-doc rule)
      .where(TextStats.qualityProbability(textCol) >= minQuality)
      .withColumn("lang", TextStats.langId(textCol))
      .withColumn("n_tokens", TextStats.tokensWhitespace(textCol))
    StreamDedup.firstSeenNormalized(scored, textCol, eventTime, lateness)
  }

  /** Quality-drift monitor — the feed-health dashboard next to the
    * gate: per tumbling event-time window, document count and the
    * mean/stddev of the quality probability over ALL arrivals (gated
    * and not — drift detection must see what the gate rejects).
    * A watermarked windowed aggregate: state is one row per open
    * window, emitted on watermark close (append mode), independent
    * of stream volume.
    */
  def qualityDrift(
      docs: DataFrame,
      textCol: Column,
      eventTime: String = "event_time",
      windowDur: String = "1 minute",
      lateness: String = "2 minutes"): DataFrame =
    docs
      .withColumn("__p", TextStats.qualityProbability(textCol))
      .withWatermark(eventTime, lateness)
      .groupBy(window(col(eventTime), windowDur))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("__p")), 4).as("mean_quality"),
        round(stddev_pop(col("__p")), 4).as("sd_quality"))
      .select(col("window.start").as("window_start"),
        col("n_docs"), col("mean_quality"), col("sd_quality"))
}
