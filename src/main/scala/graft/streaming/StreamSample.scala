package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.Sampling

/** Streaming per-stratum uniform sampling — reservoir sampling
  * re-expressed as the MERGEABLE bottom-k hash sketch so the stream
  * needs no randomness state at all: each stratum's state is the k
  * rows with the smallest salted md5-uniform of their id seen SO FAR
  * (O(strata·k) total, independent of stream length), and because
  * `bottomK(A ∪ B) = merge(bottomK(A), bottomK(B))`, the maintained
  * sample after any number of micro-batches is EXACTLY the batch
  * [[graft.llm.Sampling.sampleBottomK]] of everything that ever
  * arrived — same rows, same hash contract, any arrival order.
  * `StreamSampleSpec` pins that equality, which is what lets a
  * downstream training pipeline swap the batch and streaming samplers
  * without changing the selected set.
  *
  * Each trigger emits the updated strata's full current sample
  * (update mode); the union of emissions is a superset of the final
  * sample, so a reader recovers it as the bottom-k of the emitted
  * rows per stratum — or just takes the last trigger's emission.
  */
object StreamSample {

  final case class SampleRow(stratum: String, id: Long, u: Double)
  final case class BkState(ids: Array[Long], us: Array[Double])

  /** `rows` must carry (stratum: String, id: Long). */
  def bottomK(
      rows: DataFrame,
      k: Int,
      salt: String = "resv"): Dataset[SampleRow] = {
    require(k >= 1, "k must be positive")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .as[(String, Long)](Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        processStratum(k, salt))
  }

  private def processStratum(k: Int, salt: String)(
      stratum: String,
      rows: Iterator[(String, Long)],
      state: GroupState[BkState]): Iterator[SampleRow] = {
    val cur = state.getOption
      .map(st => st.ids.zip(st.us).map { case (id, u) => (u, id) })
      .getOrElse(Array.empty[(Double, Long)])
    val fresh = rows.map { case (_, id) =>
      (Sampling.hash01Local(id.toString, salt), id)
    }.toArray
    val merged = (cur ++ fresh).distinct.sortBy(identity).take(k)
    state.update(BkState(merged.map(_._2), merged.map(_._1)))
    merged.iterator.map { case (u, id) => SampleRow(stratum, id, u) }
  }
}
