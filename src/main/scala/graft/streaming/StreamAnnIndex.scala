package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

import graft.llm.Similarity

/** Streaming IVF index maintenance — the INGEST side of
  * [[graft.llm.AnnIndex]]'s contract. The serve-path operators
  * (`maxSimShortlist`, `ivfSearch(assignment = …)`) read the cell
  * assignment as ingest-owned state; this maintainer is what owns it:
  * per micro-batch, arriving vectors are assigned to their home cell
  * against the broadcast centroid table (one `ivfAssign` over the
  * batch — O(|batch|·nlist·d), never the corpus) and appended to the
  * persisted assignment store.
  *
  * Exactly-once via the [[StreamAdmit.admitterIndexedIdempotent]]
  * pattern: each batch writes (mode overwrite) into its OWN
  * `batch_id=N` partition directory, so a replay after any crash
  * overwrites its previous partial attempt and the store never holds
  * duplicate or torn batches. Readers take the store as-is (the
  * assignment of a vector is deterministic in (vector, centroids), so
  * unlike the dedup admitter there is no pre-batch-view read needed —
  * a replayed batch writes byte-identical rows).
  *
  * Centroids are fixed for the life of the stream (the coarse
  * quantizer is trained offline and versioned, the FAISS deployment
  * model); retraining means a new store directory and a backfill.
  */
object StreamAnnIndex {
  /** foreachBatch hook maintaining `storeDir` as the (idCol,
    * centroid_id, sim, batch_id) assignment relation.
    */
  def maintainer(
      centroids: DataFrame,
      storeDir: String,
      idCol: String = "vec_id",
      embCol: String = "embedding"): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      // argmax kernel, not join+window: a backfill batch × a large
      // trained cell count must not materialize |batch|·nlist rows
      Similarity.ivfAssignKernel(batch, centroids, idCol, embCol)
        .write.mode("overwrite")
        .parquet(s"$storeDir/batch_id=$batchId")
    }

  /** The assignment relation as the serve path wants it (idCol,
    * centroid_id, sim) — empty-store-safe with the schema derived
    * from a template of the vector relation, and resolved through the
    * store's own filesystem (hdfs://, s3a://, …).
    */
  def assignment(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String,
      template: DataFrame,
      centroids: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(storeDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    def empty = Similarity.ivfAssign(template.limit(0), centroids, idCol, embCol)
    // Degrade to the typed empty relation ONLY for the state a replay
    // will overwrite into existence: a store with no COMMITTED parquet
    // yet (first batch crashed mid-write, leaving _temporary/_SPARK
    // staging debris). Decided by LISTING the store for committed data
    // files, not by catching every read failure — a corrupted or
    // unreadable store must fail loudly, never silently serve zero
    // results.
    if (!fs.exists(path) || !hasCommittedParquet(fs, path)) empty
    else spark.read.parquet(storeDir).drop("batch_id")
  }

  /** True iff the store holds at least one committed parquet data file
    * (ignoring `_temporary` staging trees and `_`/`.`-prefixed
    * metadata like _SUCCESS).
    */
  private[streaming] def hasCommittedParquet(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Boolean = {
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      val inStaging = {
        var p = f.getPath.getParent
        var staged = false
        while (p != null && !staged) {
          if (p.getName == "_temporary") staged = true
          p = p.getParent
        }
        staged
      }
      if (!inStaging && !name.startsWith("_") && !name.startsWith(".") &&
        name.endsWith(".parquet") && f.getLen > 0) return true
    }
    false
  }

  /** Group-granular membership for [[Similarity.maxSimShortlist]]:
    * the stored assignment joined back to the group column and
    * collapsed to DISTINCT (d_group, centroid_id).
    */
  def cellGroups(
      assignment: DataFrame,
      docVecs: DataFrame,
      groupCol: String = "group_id",
      idCol: String = "vec_id"): DataFrame =
    assignment
      .select(col(idCol).as("__id"), col("centroid_id"))
      .join(docVecs.select(col(idCol).as("__id"), col(groupCol).as("d_group")),
        Seq("__id"))
      .select(col("d_group"), col("centroid_id")).distinct()
}
