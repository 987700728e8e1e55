package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Lineage.TruncateOps

/** Composite training-data curation pipeline — the end-to-end shape a
  * 100 TB corpus pass takes, assembled from the individual operators:
  *
  *   1. quality gate (cheap per-row scoring — map-only, runs first so
  *      everything downstream sees less data);
  *   2. exact dedup on normalized text (one hash aggregate);
  *   3. MinHash-LSH near-dup candidates → Jaccard verify → connected
  *      components → keep-first (banded/bucketed throughout — no
  *      all-pairs stage at any step).
  *
  * Returns the surviving documents. Every stage is independently
  * oracle-checked; the composite is too (`d_curate`).
  */
object Pipeline {

  /** [[curate]] plus the benchmark-decontamination tail: documents
    * sharing `minShared`+ distinct 5-word shingles with the
    * (broadcast-sized) eval set are dropped AFTER dedup — the
    * cheapest point, since dedup has already shrunk the corpus and
    * the eval side is a broadcast join either way.
    */
  def curateDecontaminated(
      docs: DataFrame,
      evalSet: DataFrame,
      qualityThreshold: Double = 0.75,
      nearDupThreshold: Double = 0.5,
      minShared: Int = 2): DataFrame = {
    // the curate survivors feed BOTH the decon shingle pass and the
    // final anti-join — materialize once, like curate's own exact set
    // (deferred: the cut lands inside the first consuming action)
    val kept = curate(docs, qualityThreshold, nearDupThreshold)
      .truncateLineageDeferred()
    kept.join(
      Decontaminate.contaminated(kept, evalSet,
          col("text"), col("doc_id"), col("text"), w = 5, minShared = minShared)
        .select("doc_id"),
      Seq("doc_id"), "left_anti")
  }

  def curate(
      docs: DataFrame,
      qualityThreshold: Double = 0.75,
      nearDupThreshold: Double = 0.5): DataFrame = {
    val quality = docs.where(TextStats.qualityScoreRaw(col("text")) >= qualityThreshold)
    // The exact-dedup survivor set is consumed TWICE (minhash candidate
    // generation and the final keep-join) — materialize it once instead
    // of recomputing the quality scan + hash aggregate per consumer.
    // Lineage.truncate spills via the block manager (memory-and-disk)
    // by default — the same storage bet the CC loop already makes — or
    // to the reliable graft.checkpoint.dir when configured; the
    // alternative at 100 TB is two full corpus recomputations.
    val exact = Dedup.exactKeep(quality, md5(Dedup.normalizedText(col("text"))))
      .truncateLineageDeferred()
    val pairs = Dedup
      .minhashNearDups(exact, col("text"), col("doc_id"), threshold = nearDupThreshold)
      .select("id_a", "id_b")
    Dedup.nearDupKeep(exact, pairs)
  }

  /** The dedup-funnel "data card": document and token counts after
    * each curation stage (raw → quality gate → exact dedup → near-dup
    * dedup) — the survival table every dataset release publishes.
    * Each stage row is a 1-row global aggregate over the SAME staged
    * relations [[curate]] builds (the exact-dedup survivor set is
    * already materialized once there); the four rows union at the
    * end — stage-count work, not corpus work.
    */
  def funnelReport(
      docs: DataFrame,
      qualityThreshold: Double = 0.75,
      nearDupThreshold: Double = 0.5): DataFrame = {
    // ONE corpus scan evaluates the quality predicate and the token
    // count; every stage reads the cut instead of re-scanning parquet
    // (round-17: the previous shape scanned the corpus twice and
    // evaluated qualityScoreRaw per scan — once for the raw/quality
    // conditional aggregate, once for the gate feeding exact dedup).
    // The flag/token columns are a byte and a long per row — the same
    // signature-sized-column discipline as the minhash cut; the
    // corpus-sized cut itself is the storage bet this operator's
    // `exact` stage already made.
    val passes = TextStats.qualityScoreRaw(col("text")) >= qualityThreshold
    val toks = TextStats.tokensWhitespace(col("text")).cast("long")
    val flagged = docs
      .withColumn("__pass", passes)
      .withColumn("__toks", toks)
      .truncateLineageDeferred()
    // stages 1+2: conditional aggregates over the flagged cut — the
    // quality gate is a per-row flag read, not a second evaluation
    val rawQuality = flagged.groupBy().agg(
        count(lit(1)).as("n1"), sum(col("__toks")).as("t1"),
        count(when(col("__pass"), lit(1))).as("n2"),
        sum(when(col("__pass"), col("__toks"))).as("t2"))
      .select(explode(array(
        struct(lit(1L).as("stage_no"), lit("raw").as("stage"),
          col("n1").as("n_docs"), col("t1").as("n_tokens")),
        struct(lit(2L).as("stage_no"), lit("quality").as("stage"),
          col("n2").as("n_docs"), col("t2").as("n_tokens")))).as("r"))
      .select("r.stage_no", "r.stage", "r.n_docs", "r.n_tokens")
    // stage rows 3/4 reuse the per-row __toks carried through the
    // dedup chain (exactKeep/nearDupKeep return their input rows), so
    // the tokenizer runs once per document in the whole report
    def stageRow(no: Int, name: String, df: DataFrame): DataFrame =
      df.groupBy().agg(
          count(lit(1)).as("n_docs"),
          sum(col("__toks")).as("n_tokens"))
        .select(lit(no.toLong).as("stage_no"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    val quality = flagged.where(col("__pass"))
    val exact = Dedup.exactKeep(quality, md5(Dedup.normalizedText(col("text"))))
      .truncateLineageDeferred()
    val pairs = Dedup
      .minhashNearDups(exact, col("text"), col("doc_id"), threshold = nearDupThreshold)
      .select("id_a", "id_b")
    val near = Dedup.nearDupKeep(exact, pairs)
    rawQuality
      .unionByName(stageRow(3, "exact", exact))
      .unionByName(stageRow(4, "neardup", near))
  }

  /** Snapshot diff between two corpus versions — the audit an
    * incremental release publishes (what changed since v1): per
    * status (`added` / `removed` / `changed` / `unchanged`), document
    * counts, decided by a full-outer id join over content hashes.
    * One shuffle on the id (AQE-sizable), status is a projection —
    * no content ever moves, only (id, md5) pairs.
    */
  def snapshotDiff(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      idCol: Column = col("doc_id"),
      textCol: Column = col("text")): DataFrame = {
    val o = oldDocs.select(idCol.as("doc_id"), md5(textCol).as("__h_old"))
    val n = newDocs.select(idCol.as("doc_id"), md5(textCol).as("__h_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") =!= col("__h_new"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n_docs"))
  }
}
