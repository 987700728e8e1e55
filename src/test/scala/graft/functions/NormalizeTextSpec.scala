package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** NormalizeText kernel + codegen integration. */
class NormalizeTextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def norm(s: String) =
    new TextNormalizer(true, true, true)
      .normalize(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      .toString

  test("kernel: NFC, accent strip, casefold, whitespace collapse") {
    // decomposed e + combining acute composes, then strips
    assert(norm("élan") == "elan")
    assert(norm("Élan  CAFÉ\t Ünïted") == "elan cafe united")
    assert(norm("Åse çédille Ñandú") == "ase cedille nandu")
    // no canonical decomposition → passes through
    assert(norm("søster") == "søster")
    assert(norm("  lead trail  ") == "lead trail")
    assert(norm("") == "")
  }

  test("flags gate each stage") {
    def n(a: Boolean, c: Boolean, w: Boolean, s: String) =
      new TextNormalizer(a, c, w)
        .normalize(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toString
    assert(n(false, true, true, "CAFÉ") == "café")   // accents kept
    assert(n(true, false, true, "CAFÉ") == "CAFE")   // case kept
    assert(n(true, true, false, "A  B") == "a  b")   // runs kept
  }

  test("column integrates with codegen and keeps the map fused") {
    // range-backed source: a local Seq folds to LocalTableScan at
    // plan time and would bypass codegen entirely
    val df = spark.range(2)
      .select(when(col("id") === 0, lit("élan  CAFÉ"))
        .otherwise(lit(null).cast("string")).as("s"))
      .select(NormalizeText.column(col("s")).as("n"))
    assert(df.collect().map(r => Option(r.getString(0))).toSet ==
      Set(Some("elan cafe"), None))
    // `*(1)` marks the whole-stage-codegen span: the projection fused
    // with the source rather than falling back to interpreted eval
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [normalize_text"), plan)
  }
}
