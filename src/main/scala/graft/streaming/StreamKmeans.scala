package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Streaming mini-batch k-means (Sculley 2010) — the online twin of
  * [[graft.llm.Similarity.kmeansTrain]], for maintaining cluster
  * structure over an ingest stream (routing new documents to topic
  * shards, drift monitoring, IVF cell upkeep) without ever rerunning
  * the batch loop.
  *
  * Same model-on-driver discipline as the batch trainer: the model
  * (k·d doubles + k counts) lives in a [[Model]] the `foreachBatch`
  * closure owns; per trigger the batch is assigned with the identical
  * map-only literal-centroid argmax (one aggregate job, no join, no
  * window, k·d rows collected) and each touched centroid moves to the
  * running mean of every vector EVER assigned to it:
  * `c ← (c·n + Σ_batch x) / (n + m)` — Sculley's per-centroid
  * learning rate 1/n schedule in batched form. Untouched centroids
  * keep their state. New means are floored to the same 2^-20 grid, so
  * a given batch SEQUENCE yields bit-identical models on any
  * partitioning; the sequence itself matters (online k-means is
  * order-dependent by construction — that is the trade against the
  * batch loop, which rescans).
  *
  * Initialization: the k lowest-id vectors seen so far; until k
  * distinct ids exist the model buffers the k lowest arrivals
  * (bounded at k rows) and no update runs — rows of those pre-init
  * batches contribute as seed candidates only, by declared scope.
  * The batch that completes the seed IS then assigned like any other
  * — a single-batch stream therefore reproduces
  * `kmeansTrain(iters = 1)` exactly (pinned in `StreamKmeansSpec`).
  */
object StreamKmeans {

  /** Driver-side model: centroids, per-centroid lifetime counts, and
    * the pre-init buffer. All mutation happens inside the
    * `foreachBatch` callback (micro-batches are sequential), so no
    * synchronization is needed beyond `snapshot`'s copy.
    */
  final class Model(val k: Int, val dim: Int) {
    private[StreamKmeans] var cents: Array[Array[Double]] = Array.empty
    private[StreamKmeans] var counts: Array[Long] = Array.empty
    private[StreamKmeans] var buffer: Vector[(Long, Array[Double])] = Vector.empty
    def initialized: Boolean = cents.nonEmpty
    /** (centroid_id, centroid, n_assigned) — a defensive copy. */
    def snapshot: Seq[(Long, Array[Double], Long)] = synchronized {
      cents.indices.map(j => (j.toLong, cents(j).clone(), counts(j)))
    }
  }

  private def q20(x: Double): Double = graft.llm.Grid.q20(x)

  /** `foreachBatch` body updating `model` from each micro-batch.
    * `batch` must carry (`idCol`: long, `embCol`: array<float|double>).
    */
  def updater(
      model: Model,
      idCol: String = "vec_id",
      embCol: String = "embedding"): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => {
      val rows = batch.select(col(idCol).cast("long").as("id"), col(embCol).as("emb"))
      val pending = if (!model.initialized) {
        // buffer the k lowest-id arrivals until the model can seed;
        // ≤ k rows ever cross the driver here (TakeOrdered(k) job).
        // Dedup BEFORE the limit: a replayed id inside the batch's k
        // lowest rows would otherwise crowd out real seed candidates
        // and the single-batch ≡ kmeansTrain contract would break
        val head = rows.dropDuplicates("id")
          .orderBy(col("id").asc).limit(model.k).collect()
          .map(r => (r.getLong(0), r.getSeq[Any](1).map {
            case f: Float  => f.toDouble
            case d: Double => d
          }.toArray))
        model.synchronized {
          // distinctBy on the id — tuple distinct would compare the
          // array by reference and keep same-id replays
          model.buffer = (model.buffer ++ head)
            .distinctBy(_._1).sortBy(_._1).take(model.k)
          if (model.buffer.length >= model.k) {
            model.cents = model.buffer.map(_._2.clone()).toArray
            model.counts = Array.fill(model.k)(0L)
            model.buffer = Vector.empty
          }
        }
        !model.initialized
      } else false
      if (!pending) {
        // map-only argmax against centroid literals + (cid, dim) sums
        // — the kmeansTrain iteration job verbatim, plus counts
        val scored = (0 until model.k).map { j =>
          struct(
            Similarity.cosine(col("emb"), typedLit(model.cents(j).toSeq)).as("sim"),
            lit(-j).as("nj"))
        }
        val best = if (model.k == 1) scored.head else greatest(scored: _*)
        val sums = rows
          .select((-best.getField("nj")).cast("long").as("cid"), posexplode(col("emb")))
          .groupBy("cid", "pos")
          .agg(sum(col("col").cast("double")).as("s"), count(lit(1)).as("m"))
          .collect() // bounded: k·d rows (the model), never batch-sized
        model.synchronized {
          val next = model.cents.map(_.clone())
          val add = Array.fill(model.k)(0L)
          sums.foreach { r =>
            val j = r.getLong(0).toInt
            val p = r.getInt(1)
            val m = r.getLong(3)
            next(j)(p) = q20((model.cents(j)(p) * model.counts(j) + r.getDouble(2)) /
              (model.counts(j) + m))
            // one row per (cid, pos): with ragged embedding arrays the per-pos
            // counts differ, and "last row wins" would corrupt the 1/n learning
            // rate — take the max, matching StreamPca's ragged-input handling
            add(j) = math.max(add(j), m)
          }
          model.cents = next
          for (j <- 0 until model.k) model.counts(j) += add(j)
        }
      }
    }
}
