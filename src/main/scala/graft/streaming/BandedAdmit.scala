package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Lineage.TruncateOps
import graft.llm.Dedup

/** The shared banded-admission pipeline behind [[StreamMediaAdmit]]
  * and [[StreamVecAdmit]] (and structurally, the text admitter's
  * indexed path): probe the persisted band index, drop arrivals a
  * stored row verifies against (store wins), near-dup-cluster the
  * clean remainder among themselves (banded candidates → verify →
  * connected components) and keep each cluster's min id. One
  * implementation so a policy or bug fix cannot silently diverge
  * between the admission families.
  */
private[streaming] object BandedAdmit {

  /** `arrivals` must carry `id` plus its payload columns; `arrBands`
    * and `storeBands` carry `id`, `b`, `v` plus whatever columns
    * `verify` needs (the verify expression receives the two table
    * aliases to compare). Returns the admitted subset of `arrivals`.
    */
  def admit(
      storeBands: DataFrame,
      arrivals: DataFrame,
      arrBands: DataFrame,
      verify: (String, String) => Column): DataFrame = {
    val dirty = arrBands.as("a")
      .join(storeBands.as("s"),
        col("a.b") === col("s.b") && col("a.v") === col("s.v"))
      .where(verify("a", "s"))
      .select(col("a.id").as("id")).distinct()
      .truncateLineage(eager = false) // gates both the rows and the bands
    val clean = arrivals.join(dirty, Seq("id"), "left_anti")
    val cleanBands = arrBands.join(dirty, Seq("id"), "left_anti")
    val pairs = cleanBands.as("x")
      .join(cleanBands.as("y"),
        col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
          col("x.id") < col("y.id"))
      .where(verify("x", "y"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    // keep-first inline (nearDupKeep's own join key is literally
    // "id", which would collide with these relations' id column)
    val losers = Dedup.clusters(pairs)
      .where(col("id") =!= col("cluster_id"))
      .select(col("id").as("loser_id"))
    clean.join(losers, col("id") === col("loser_id"), "left_anti")
  }
}
