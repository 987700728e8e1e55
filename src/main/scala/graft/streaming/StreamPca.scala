package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Streaming top-component PCA by Oja's rule (Oja 1982; the
  * mini-batch form surveyed in Balsubramani et al. 2013) — the online
  * twin of [[graft.llm.Similarity.pcaPowerTrain]], for tracking the
  * dominant direction of an embedding stream (drift monitoring,
  * on-the-fly whitening, choosing an MRL/RP width from live data)
  * without re-running the batch Gram job.
  *
  * Update per micro-batch: `v ← normalize(v + η·Σ_batch x·(xᵀv))`
  * with η = 1/(n + m) (the classic 1/t schedule batched over m
  * arrivals, n = rows seen before this batch). The batch term is ONE
  * aggregate job: xᵀv is a map-only literal-vector dot against the
  * current iterate, and Σ x·(xᵀv) is a (dim)-keyed hash aggregate —
  * d rows to the driver per trigger, the model-on-driver discipline
  * of [[StreamKmeans]]. The iterate re-quantizes to the 2^-20 grid
  * after each normalize, so a given batch sequence yields a
  * bit-identical model on any partitioning (the sequence itself
  * matters — online PCA is order-dependent by construction).
  *
  * Initialization: v₀ = 1/√d uniformly, same as the batch trainer —
  * no data-dependent seeding, updates start with the first batch.
  */
object StreamPca {

  /** Driver-side model: the current unit iterate and rows seen. */
  final class Model(val dim: Int) {
    private[StreamPca] var vec: Array[Double] =
      Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    private[StreamPca] var n: Long = 0L
    def snapshot: (Array[Double], Long) = synchronized((vec.clone(), n))
  }

  private def q20(x: Double): Double = graft.llm.Grid.q20(x)

  /** `foreachBatch` body updating `model` from each micro-batch.
    * `batch` must carry (`embCol`: array<float|double>).
    */
  def updater(
      model: Model,
      embCol: String = "embedding"): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => {
      val (v, n) = model.snapshot
      // Σ x·(xᵀv) per dimension + the batch count: one aggregate job,
      // d+1 values to the driver
      val proj = Similarity.dot(col(embCol), typedLit(v.toSeq))
      val agg = batch
        .select(proj.as("p"), posexplode(col(embCol)).as(Seq("pos", "x")))
        .groupBy("pos")
        .agg(sum(col("x").cast("double") * col("p")).as("s"), count(lit(1)).as("m"))
        .collect()
      if (agg.nonEmpty) {
        // m = rows contributing at least one element: the max per-pos
        // count (pos groups can disagree on ragged embeddings, and
        // agg.head's group is whichever the hash aggregate returned
        // first — never a contract)
        val m = agg.map(_.getLong(2)).max
        val eta = 1.0 / (n + m).toDouble
        val u = v.clone()
        agg.foreach(r => u(r.getInt(0)) += eta * r.getDouble(1))
        var n2 = 0.0
        var i = 0
        while (i < u.length) { n2 += u(i) * u(i); i += 1 }
        val nrm = math.sqrt(n2)
        // a degenerate batch (u = 0) neither moves the iterate nor
        // advances n — data that never influenced the model must not
        // shrink eta for data that will
        if (nrm > 0) model.synchronized {
          model.vec = u.map(x => q20(x / nrm))
          model.n = n + m
        }
      }
    }
}
