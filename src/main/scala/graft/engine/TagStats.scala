package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.compiler.Tagged
import graft.compiler.Tagged.{Costs, Term}

/** Tag cardinality statistics — the Spark-native analog of the
  * `tag1_count_per_day` SummingMergeTree + materialized view
  * (`tests/clickhouse/rollup/init.sql:40-54`) and the cost querier
  * (`finder/tags_count_querier.go:29-131`).
  *
  * The per-day count table is a materialized aggregate of the tagged
  * inverted index — at scale it would be maintained incrementally by
  * the ingest stream (`foreachBatch` MERGE); deriving it here is the
  * same single `groupBy` over the (small) tag dimension.
  */
object TagStats {

  /** The count table: distinct series per (date, tag1) — what the
    * reference's materialized view sums into SummingMergeTree.
    */
  def tag1CountPerDay(tags: DataFrame): DataFrame =
    tags.groupBy(col("date"), col("tag1"))
      .agg(count(lit(1)).as("count"))

  /** `SELECT Tag1, sum(Count) GROUP BY Tag1` over the exact-equality
    * terms of a query (`tags_count_querier.go:41-88`): the candidate
    * `tag1` values are the OR of the non-wildcard `k=v` terms, date
    * bounded.
    */
  def countsForTerms(
      countTable: DataFrame,
      terms: List[Term],
      from: Long = 0,
      until: Long = 0): DataFrame = {
    val eqTags = terms.collect {
      case t if t.op == Tagged.Op.Eq && !t.hasWildcard && t.value.nonEmpty => t.concat
    }
    require(eqTags.nonEmpty, "no exact terms to cost")
    val datePred =
      if (from > 0 && until > 0)
        col("date").between(
          to_date(timestamp_seconds(lit(from))),
          to_date(timestamp_seconds(lit(until))))
      else lit(true)
    countTable
      .where(datePred && col("tag1").isin(eqTags: _*))
      .groupBy(col("tag1"))
      .agg(sum(col("count")).as("cnt"))
  }

  /** Plan-time cost lookup (`GetCostsFromCountTable`,
    * `tags_count_querier.go:41-110`): collect the (small — one row per
    * exact term value) counts and map them to per-value costs. Returns
    * None when fewer than 2 terms, no exact terms, or a queried tag
    * value is absent from the stats (the metric can't exist — the
    * reference clears its body and skips costing).
    */
  def costsForTerms(
      countTable: DataFrame,
      terms: List[Term],
      from: Long = 0,
      until: Long = 0): Option[Map[String, Costs]] = {
    if (terms.length < 2) return None
    val eqCount = terms.count(t =>
      t.op == Tagged.Op.Eq && !t.hasWildcard && t.value.nonEmpty)
    if (eqCount == 0) return None
    val rows = countsForTerms(countTable, terms, from, until).collect()
    if (rows.length < eqCount) return None
    val byKey = rows.toSeq
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy { case (tag1, _) => tag1.takeWhile(_ != '=') }
      .map { case (key, kvs) =>
        key -> Costs(valuesCost = kvs.map { case (tag1, cnt) =>
          tag1.drop(key.length + 1) -> cnt.toInt
        }.toMap)
      }
    Some(byKey)
  }

  /** Full cost-ordered term preparation (`PrepareTaggedTerms`,
    * `finder/tagged.go:614-637`): parse → cost from stats (falling
    * back to configured costs) → sort.
    */
  def prepareTerms(
      terms: List[Term],
      countTable: Option[DataFrame],
      configuredCosts: Map[String, Costs] = Map.empty,
      from: Long = 0,
      until: Long = 0): List[Term] = {
    val costed = countTable.flatMap(ct => costsForTerms(ct, terms, from, until)) match {
      case Some(costs)                          => Tagged.setCosts(terms, costs)
      case None if configuredCosts.nonEmpty     => Tagged.setCosts(terms, configuredCosts)
      case None                                 => terms
    }
    Tagged.sortTerms(costed)
  }
}
