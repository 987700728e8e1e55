package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.Dedup

/** Streaming MinHash near-duplicate detection — the streaming twin of
  * the batch `Dedup.minhashNearDups` candidate stage: a document
  * arriving within the horizon of a near-duplicate already seen gets
  * flagged, keyed by LSH band collision exactly like the batch path.
  *
  * Shape: signatures are computed IN-ROW (shingle → hash → per-
  * permutation `array_min` — no aggregation, so the only stateful
  * operator in the query is the band store), then each doc explodes
  * into its `bands` band keys and `flatMapGroupsWithState` keeps ONE
  * (first_id, signature) per band key within the watermark horizon.
  * State is O(arrival rate × horizon × bands) — independent of corpus
  * size, like [[StreamDedup]]. A collision emits a candidate pair with
  * the MinHash Jaccard estimate (matching signature fraction); exact
  * global near-dup over all history remains the batch operator's job.
  *
  * Reference trade (same as batch LSH): only same-band collisions are
  * candidates; the estimate lets downstream filter at its own
  * threshold without re-reading either document.
  */
object StreamNearDup {

  final case class Candidate(
      doc_id: Long, first_id: Long, band: String, est_jaccard: Double)

  final case class BandState(firstId: Long, sig: Seq[Long], lastSeenMs: Long)

  /** `docs` must carry the `eventTime` timestamp column plus the id
    * and text columns. Emits one [[Candidate]] per (late doc, band)
    * collision, append mode.
    */
  def candidates(
      docs: DataFrame,
      text: Column,
      id: Column,
      shingleWidth: Int = 5,
      numHashes: Int = 16,
      bands: Int = 4,
      eventTime: String = "event_time",
      lateness: String = "10 minutes",
      horizonSec: Long = 600L): Dataset[Candidate] = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    // in-row signature: shingle hashes materialize once as a column,
    // each permutation is an array_min over an attribute reference
    // (never a recomputed subtree inside the lambda — HOF discipline)
    val shingled = docs
      .select(id.as("doc_id"), col(eventTime),
        Dedup.shingles(text, shingleWidth).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("hs", transform(col("sh"), s => Dedup.shingleHash(s)))
    val withSig = shingled.select(
      col("doc_id"), col(eventTime),
      array((0 until numHashes).map(i =>
        array_min(transform(col("hs"), h => Dedup.permute(h, i)))): _*)
        .as("sig"))
    // band key: band index | the band's signature slice, same layout
    // as the batch bandKeyColumns
    val banded = withSig.select(
      col("doc_id"), col(eventTime), col("sig"),
      explode(array((0 until bands).map(b =>
        concat_ws("|",
          lit(b.toString) +: (0 until rowsPerBand).map(r =>
            col("sig")(b * rowsPerBand + r).cast("string")): _*)): _*))
        .as("band"))
    banded
      .withWatermark(eventTime, lateness)
      .as[(Long, java.sql.Timestamp, Seq[Long], String)]
      .groupByKey(_._4)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processBand(horizonSec))
  }

  /** Per-band transition: the earliest doc seen within the horizon
    * owns the band; every other arrival emits a candidate against the
    * owner. The horizon is enforced at ARRIVAL time against the
    * owner's own last sighting — the event-time timeout only cleans
    * state in quiet batches (the watermark lags a batch, so an
    * arrival after a long gap would otherwise still see the stale
    * owner) — and collisions do NOT refresh the owner, so a steady
    * near-dup stream cannot pin it forever. Batch arrival order is
    * not time order, so rows sort on (event time, id) first —
    * deterministic across retries.
    */
  private def processBand(horizonSec: Long)(
      band: String,
      rows: Iterator[(Long, java.sql.Timestamp, Seq[Long], String)],
      state: GroupState[BandState]): Iterator[Candidate] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val horizonMs = horizonSec * 1000L
    val sorted = rows.toArray.sortBy(r => (r._2.getTime, r._1))
    val out = Seq.newBuilder[Candidate]
    var owner = state.getOption
    sorted.foreach { case (docId, ts, sig, _) =>
      val ms = ts.getTime
      owner match {
        case Some(s) if ms > s.lastSeenMs + horizonMs =>
          // owner expired before this arrival: silent re-registration
          owner = Some(BandState(docId, sig, ms))
        case Some(s) if s.firstId != docId =>
          val matching = s.sig.zip(sig).count { case (a, b) => a == b }
          out += Candidate(docId, s.firstId, band,
            matching.toDouble / math.max(1, sig.length))
        case Some(s) => // the owner re-arrived: refresh its horizon
          owner = Some(s.copy(lastSeenMs = math.max(s.lastSeenMs, ms)))
        case None =>
          owner = Some(BandState(docId, sig, ms))
      }
    }
    owner.foreach { s =>
      state.update(s)
      // eviction for quiet bands; arrivals enforce the horizon above,
      // so a timeout lagging behind the watermark is harmless
      state.setTimeoutTimestamp(
        math.max(state.getCurrentWatermarkMs() + 1L, s.lastSeenMs + horizonMs))
    }
    out.result().iterator
  }
}
