package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Semantic decontamination: eval-similar vectors drop, the eval side
  * broadcasts (zero corpus shuffle on the scoring pass).
  */
class SemanticDeconSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("drops exact and near matches to the eval set, keeps the orthogonal rest") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)),  // eval member itself → cos 1
      (2L, Seq(0.99f, 0.1f)), // paraphrase-near → cos ≈ 0.995
      (3L, Seq(0.0f, 1.0f)),  // orthogonal → survives
      (4L, Seq(-1.0f, 0.0f))  // opposite → survives
    ).toDF("vec_id", "embedding")
    val evalSet = corpus.where(col("vec_id") === 1L)

    val out = Similarity.semanticDecon(corpus, evalSet, threshold = 0.95)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "eval side must broadcast — a shuffled theta join moves the corpus")

    assert(out.select("vec_id").collect().map(_.getLong(0)).toSet == Set(3L, 4L))
  }
}
