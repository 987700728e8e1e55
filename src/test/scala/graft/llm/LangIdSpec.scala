package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The native language-ID kernel must match the per-language Column
  * composition — including shared stopwords ("de"/"la"/"en" live in
  * several tables), ties, and the "und" fallback.
  */
class LangIdSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("kernel == reference on adversarial inputs") {
    import spark.implicits._
    val texts = Seq(
      "the cat sat of the mat and it was fine",  // en
      "le chat et la souris sont des amis",      // fr
      "el perro y el gato que juegan en la casa",// es
      "der hund und die katze mit den kindern",  // de
      "de la un en es",                          // shared words → tie-break
      "xyzzy plugh nothing matches here",        // und
      "", "   ",
      "THE OF AND TO IN",                        // case folding
      "la la la la der der der der"              // fr/es vs de counts
    ).toDF("text")
    val rows = texts.select(
      TextStats.langId(col("text")).as("native"),
      TextStats.langIdReference(col("text")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"diverged: native=${r.getString(0)} ref=${r.getString(1)}")
    }
  }
}
