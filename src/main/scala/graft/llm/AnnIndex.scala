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

  // same store-epoch contract as GraphiteTables.memo: the Retuner
  // tick bumps the dir's epoch on a changed store stat, the epoch
  // rides the key, superseded entries are dropped here
  graft.StoreEpochs.onBump((app, dir, epoch) => {
    val live = s"@e$epoch"
    built.keySet.removeIf(k =>
      k._1 == app && k._2 == dir && !k._3.endsWith(live))
  })

  private def memo(spark: SparkSession, dir: String, kind: String)(
      build: => DataFrame): DataFrame =
    if (spark.conf.getOption(graft.engine.GraphiteTables.DisableMemoKey)
        .contains("true")) build
    else {
      val app = spark.sparkContext.applicationId
      val suffix = graft.StoreEpochs.keySuffix(app, dir)
      val key = (app, dir, kind + suffix)
      val out = built.computeIfAbsent(
        key, _ => graft.Lineage.truncate(build, eager = false))
      // post-insert epoch recheck — same insert-after-bump window as
      // GraphiteTables.memo (see the comment there): an entry whose
      // epoch moved while it was being computed is returned (valid
      // pre-bump read) but not retained, so its checkpoint blocks
      // never outlive the bump that superseded them.
      if (graft.StoreEpochs.keySuffix(app, dir) != suffix)
        built.remove(key)
      out
    }

  /** Canonical-plan fingerprint of an input relation, folded into the
    * memo key so two DIFFERENT derivations (a different centroid set,
    * a different doc-group column formula) can never silently share a
    * cached assignment. `semanticHash` is a pure plan-side hash over
    * the canonicalized logical plan — zero jobs, zero data reads — so
    * the hit path stays free; two separate `spark.read.parquet(dir)`
    * calls canonicalize equal (FileIndex equality is rootPath-based),
    * so re-built identical derivations still HIT (`AnnIndexSpec` pins
    * both directions). Derivations whose plan embeds fresh
    * non-deterministic state (e.g. re-running `kmeansTrain` per call
    * materializes a new LogicalRDD each time) hash fresh and MISS —
    * the correct failure direction: a redundant rebuild for a caller
    * already paying per-call training, never a wrong-index read.
    */
  private def planTag(df: DataFrame): String =
    java.lang.Integer.toHexString(df.queryExecution.analyzed.semanticHash())

  /** The vector-granular IVF assignment (idCol, centroid_id, sim) —
    * [[Similarity.ivfAssign]] as memoized index state, fed to
    * [[Similarity.ivfSearch]]'s `assignment` by serve-path queries.
    *
    * KEY CONTRACT: the memo key is (dir, nlist, quantizerTag, columns,
    * [[planTag]] of both relations). The plan fingerprints are the
    * machine check — distinct vector or centroid derivations get
    * distinct entries with no caller discipline; `quantizerTag`
    * remains as the human-readable label (and the disambiguator if a
    * 32-bit plan-hash collision ever pairs two distinct derivations).
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
    memo(spark, dir, s"ivf-cells-$nlist-$quantizerTag-$idCol-$embCol" +
        s"-v${planTag(vectors)}-c${planTag(centroids)}") {
      // index-build path: the argmax kernel, NOT join+window — the
      // latter materializes n·nlist rows and dies at x1000 (see
      // Similarity.ivfAssignKernel)
      Similarity.ivfAssignKernel(vectors, centroids, idCol, embCol)
    }

  /** The distinct (d_group, centroid_id) inverted membership a
    * late-interaction (MaxSim) shortlist probes — IVF index state at
    * document-group granularity, fed to
    * [[Similarity.maxSimShortlist]]'s `cellGroups`. Same key contract
    * as [[ivfCells]]; the docVecs [[planTag]] covers the GROUP
    * derivation too (a `floor(vec_id/4)` grouping and a `vec_id % 7`
    * grouping over the same dir are different plans, so they can never
    * share a cached membership even under one `groupCol` name).
    */
  /** The epoch'd streamed ANN store's current assignment
    * ([[graft.streaming.StreamAnnIndex.epochAssignment]]) as memoized
    * serve state — the composition that closes the serving lifecycle:
    * the maintainer owns the store at ingest, [[graft.StoreEpochs]]
    * bumps this memo's key when the Retuner tick observes the store
    * change (a re-index epoch swap grows/changes the store's file
    * set), and the next request re-resolves the `_CURRENT` pointer
    * ONCE and is memoized again — so a drift re-index reaches a
    * long-lived serving session at its next tick with no restart and
    * no per-query pointer/parquet re-read. `StoreEpochSpec` drives
    * reindex → tick → serve end to end.
    */
  def epochCells(
      spark: SparkSession,
      base: String,
      template: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    memo(spark, base, s"epoch-cells-$idCol-$embCol-t${planTag(template)}") {
      graft.streaming.StreamAnnIndex.epochAssignment(
        spark, base, template, idCol, embCol)
    }

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
    memo(spark, dir, s"maxsim-cells-$nlist-$quantizerTag-$groupCol-$idCol-$embCol" +
        s"-d${planTag(docVecs)}-c${planTag(centroids)}") {
      Similarity.maxSimCellGroups(docVecs, centroids, groupCol, idCol, embCol,
        kernelAssign = true)
    }
}
