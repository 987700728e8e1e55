package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the [[graft.events.Sketches]] aggregates.
  *
  * Both sketches are mergeable with a trivial combiner — CM cells by
  * `+`, HLL registers by `max` — so the streaming form is keyed state
  * per CELL, not per key: the state cardinality is d·w (CMS) or
  * groups·m (HLL) regardless of how many distinct keys the stream
  * ever carries, and after any number of micro-batches the maintained
  * state is EXACTLY the batch sketch of everything that arrived
  * (`StreamSketchSpec` pins the equality). The hash arithmetic lives
  * in [[graft.events.Sketches.cmsCells]] / `hllObservations`, applied
  * in-plan BEFORE the stateful step, so batch and stream share one
  * spelling by construction.
  *
  * Each trigger emits the touched cells' current values (update
  * mode); the last emission per cell is the sketch. HLL register
  * updates are idempotent under replay (max), CM counts are
  * exactly-once per delivered row — under an at-least-once source,
  * CM needs upstream dedup (e.g. [[StreamDedup]]) in front, which is
  * the standard CM-sketch caveat, not a property of this operator.
  */
object StreamSketch {

  final case class CmsCell(row: Long, bucket: Long, n: Long)
  final case class HllReg(g: String, bucket: Long, reg: Long)

  /** `cells` must carry (row: Long, bucket: Long) — the output of
    * [[graft.events.Sketches.cmsCells]] over the stream.
    */
  def cms(cells: DataFrame): Dataset[CmsCell] = {
    val spark = cells.sparkSession
    import spark.implicits._
    cells
      .as[(Long, Long)](Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(addCell)
  }

  private def addCell(
      cell: (Long, Long),
      rows: Iterator[(Long, Long)],
      state: GroupState[Long]): CmsCell = {
    val n = state.getOption.getOrElse(0L) + rows.size
    state.update(n)
    CmsCell(cell._1, cell._2, n)
  }

  /** `obs` must carry (g: String, bucket: Long, rho: Long) — the
    * output of [[graft.events.Sketches.hllObservations]] over the
    * stream.
    */
  def hll(obs: DataFrame): Dataset[HllReg] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs
      .as[(String, Long, Long)](Encoders.tuple(
        Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong))
      .groupByKey(o => (o._1, o._2))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(maxReg)
  }

  private def maxReg(
      reg: (String, Long),
      rows: Iterator[(String, Long, Long)],
      state: GroupState[Long]): HllReg = {
    val m = math.max(state.getOption.getOrElse(0L), rows.map(_._3).max)
    state.update(m)
    HllReg(reg._1, reg._2, m)
  }

  final case class BloomBit(pos: Long)

  /** Streaming Bloom build: state is one boolean per SET position
    * (≤ `bits` entries ever), set-once and emitted on every touch —
    * trivially idempotent under replay (OR). `cells` must carry a
    * single `pos: Long` column, e.g.
    * `Sketches.cmsCells(stream, key, numHashes, bits).select($"bucket" as "pos")`.
    */
  def bloom(cells: DataFrame): Dataset[BloomBit] = {
    val spark = cells.sparkSession
    import spark.implicits._
    cells
      .as[Long](Encoders.scalaLong)
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(setBit)
  }

  private def setBit(
      pos: Long,
      rows: Iterator[Long],
      state: GroupState[Boolean]): BloomBit = {
    state.update(true)
    BloomBit(pos)
  }
}
