package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingest-owned ANN index state.
  *
  * The IVF coarse-quantizer assignment — every stored vector keyed by
  * its nearest of the [[Similarity.ivfPlan]]-sized centroid set — is
  * INDEX state, not query work: building it costs one corpus pass ×
  * nlist broadcast-centroid cosines (FAISS's `add()` cost, O(n·√n·d)
  * under the sqrt cell rule), and a serving deployment maintains it
  * incrementally at ingest exactly like the graphite index/tags
  * tables ([[graft.engine.GraphiteTables]] states the same contract
  * for its derived tables). Queries read the assignment relation;
  * only probe + shortlist work scales with the request. The ×100
  * scale probe made the cost split concrete: paying assignment
  * per-query read 132 s at ×100 (n^1.5 — worse than the exhaustive
  * scan it was built to beat), while the served path against the
  * built index reads the corpus once per batch.
  *
  * Memoized per (application, dir, kind) via [[graft.Lineage.truncate]]
  * like `GraphiteTables.memo` — a LogicalRDD, so repeated references
  * canonicalize equal and reuse exchanges — and honoring the same
  * `graft.memo.disable` escape hatch (staleness opt-out + census
  * observability). The same durability contract applies: multi-
  * executor deployments set `graft.checkpoint.dir` to make the cut
  * reliable.
  */
object AnnIndex {
  private val built =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), DataFrame]()

  private def memo(spark: SparkSession, dir: String, kind: String)(
      build: => DataFrame): DataFrame =
    if (spark.conf.getOption(graft.engine.GraphiteTables.DisableMemoKey)
        .contains("true")) build
    else built.computeIfAbsent(
      (spark.sparkContext.applicationId, dir, kind),
      _ => graft.Lineage.truncate(build, eager = false))

  /** The vector-granular IVF assignment (idCol, centroid_id, sim) —
    * [[Similarity.ivfAssign]] as memoized index state, fed to
    * [[Similarity.ivfSearch]]'s `assignment` by serve-path queries.
    *
    * KEY CONTRACT: the memo key is (dir, nlist, quantizerTag,
    * columns) — the centroid RELATION itself is not fingerprinted
    * (hashing it would cost a job on every hit), so callers with a
    * different centroid derivation over the same corpus MUST pass a
    * distinct `quantizerTag` (e.g. `"lloyd3"` for trained cells vs
    * the default first-`nlist`-ids quantizer) or they silently read
    * the other quantizer's assignment.
    */
  def ivfCells(
      spark: SparkSession,
      dir: String,
      vectors: DataFrame,
      centroids: DataFrame,
      nlist: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      quantizerTag: String = "first-ids"): DataFrame =
    memo(spark, dir, s"ivf-cells-$nlist-$quantizerTag-$idCol-$embCol") {
      // index-build path: the argmax kernel, NOT join+window — the
      // latter materializes n·nlist rows and dies at x1000 (see
      // Similarity.ivfAssignKernel)
      Similarity.ivfAssignKernel(vectors, centroids, idCol, embCol)
    }

  /** The distinct (d_group, centroid_id) inverted membership a
    * late-interaction (MaxSim) shortlist probes — IVF index state at
    * document-group granularity, fed to
    * [[Similarity.maxSimShortlist]]'s `cellGroups`. Same
    * `quantizerTag` key contract as [[ivfCells]].
    */
  def maxSimCellGroups(
      spark: SparkSession,
      dir: String,
      docVecs: DataFrame,
      centroids: DataFrame,
      nlist: Int,
      groupCol: String = "group_id",
      idCol: String = "vec_id",
      embCol: String = "embedding",
      quantizerTag: String = "first-ids"): DataFrame =
    memo(spark, dir, s"maxsim-cells-$nlist-$quantizerTag-$groupCol-$idCol-$embCol") {
      Similarity.maxSimCellGroups(docVecs, centroids, groupCol, idCol, embCol,
        kernelAssign = true)
    }
}
