package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove training documents that share
  * word n-grams with an evaluation set (the GPT-3/Gopher-style
  * overlap filter that keeps test questions out of the train split).
  *
  * Scale shape: the eval side is benchmark-sized (thousands of docs),
  * so its distinct shingle set is broadcast — the corpus makes ONE
  * map pass (shingle + explode), hits the broadcast hash join, and a
  * partial-aggregated count per doc does the threshold; no shuffle of
  * corpus text, no pairwise stage. The corpus-side explode is the
  * same single pass every other TextStats/Dedup signal rides.
  */
object Decontaminate {

  /** Docs sharing at least `minShared` distinct `w`-word shingles
    * with ANY eval doc → (doc_id, n_shared).
    */
  def contaminated(
      docs: DataFrame,
      evalTexts: DataFrame,
      textCol: Column,
      idCol: Column,
      evalTextCol: Column,
      w: Int = 5,
      minShared: Int = 2): DataFrame = {
    val evalShingles = evalTexts
      .select(explode(Dedup.shingles(evalTextCol, w)).as("sh"))
      .distinct()
    docs
      .select(idCol.as("doc_id"), explode(Dedup.shingles(textCol, w)).as("sh"))
      // per-doc shingles are already distinct, so a plain count after
      // the semi-restricting join counts distinct shared shingles
      .join(broadcast(evalShingles), Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** The decontaminated corpus: `docs` minus [[contaminated]] ids. */
  def clean(
      docs: DataFrame,
      evalTexts: DataFrame,
      textCol: Column,
      idCol: Column,
      evalTextCol: Column,
      w: Int = 5,
      minShared: Int = 2): DataFrame = {
    val bad = contaminated(docs, evalTexts, textCol, idCol, evalTextCol, w, minShared)
      .select(col("doc_id").as("__contaminated_id"))
    docs.join(bad, idCol === col("__contaminated_id"), "left_anti")
  }
}
