package graft.prom

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Randomized equivalence: the fused conditional-aggregate binop path
  * (`agg by (g) (m{f1}) op agg by (g) (m{f2})` → one scan) must
  * produce EXACTLY the generic two-pipeline + (k, t)-join result for
  * every op/agg/grouping/filter combination. Integer sample values
  * keep the double sums exact, so equality is bitwise — any semantic
  * drift in the fusion (presence gating, name dropping, grouping,
  * conditional-aggregate null handling) fails loudly.
  * stddev/stdvar are excluded here (their incremental moments are
  * float-order-sensitive in the last ulp on BOTH paths); their
  * fusion is covered by the `p_query_*` oracles.
  */
class FusedBinOpPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // 12 series over (job, inst, extra) with per-series sample gaps
  private lazy val pts = {
    import spark.implicits._
    val rows = for {
      job <- Seq("a", "b", "c")
      inst <- Seq("1", "2")
      extra <- Seq("x", "y")
      t <- 0L to 40L by 10L
      // deterministic gaps: drop ~1/3 of samples
      if (job.hashCode + inst.hashCode + extra.hashCode + t).abs % 3 != 0
    } yield (s"m?extra=$extra&inst=$inst&job=$job", t,
      ((job.hashCode.abs + inst.toInt * 7 + extra.hashCode.abs + t) % 23).toDouble)
    rows.toDF("path", "time", "value")
  }

  private lazy val tagRows = graft.engine.GraphiteTables.expandTagRows(
    pts.select(col("path")).distinct()
      .withColumn("date", lit("1970-01-01").cast("date"))
      .withColumn("version", lit(0L)))

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Double)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private def evalFused(q: String): Set[(String, Long, Double)] = {
    val e = PromQL.parse(q).fold(err => fail(s"parse($q): $err"), identity)
    rowSet(PromQL.evalMatrix(pts, tagRows, e, 0L, 40L, 10L, lookbackSec = 15L)
      .where(!isnan(col("value"))))
  }

  private def evalGeneric(ql: String, qr: String, op: String): Set[(String, Long, Double)] = {
    def side(q: String) = {
      val e = PromQL.parse(q).fold(err => fail(s"parse($q): $err"), identity)
      PromQL.evalMatrix(pts, tagRows, e, 0L, 40L, 10L, lookbackSec = 15L)
    }
    rowSet(PromQL.binOpMatrix(side(ql), side(qr), op)
      .where(!isnan(col("value"))))
  }

  test("fused ≡ generic across 120 random agg/op/grouping/filter combos") {
    val aggOp = Gen.oneOf("sum", "avg", "min", "max", "count", "group")
    val by = Gen.oneOf("job", "inst", "extra", "job, inst", "")
    val filt = Gen.oneOf("", """job="a"""", """inst="1"""", """extra="y"""",
      """job=~"a|b"""", """inst!="2"""")
    val binop = Gen.oneOf("+", "-", "*", "/")
    val cases = Gen.zip(aggOp, aggOp, by, filt, filt, binop)
    var seed = Seed(42L)
    var checked = 0
    while (checked < 120) {
      cases.apply(Gen.Parameters.default, seed).foreach {
        case (a1, a2, g, f1, f2, op) =>
          val sel1 = if (f1.isEmpty) "m" else s"m{$f1}"
          val sel2 = if (f2.isEmpty) "m" else s"m{$f2}"
          val ql = s"$a1 by ($g) ($sel1)"
          val qr = s"$a2 by ($g) ($sel2)"
          val fused = evalFused(s"$ql $op $qr")
          val generic = evalGeneric(ql, qr, op)
          assert(fused == generic,
            s"mismatch for: $ql $op $qr\nfused=$fused\ngeneric=$generic")
          checked += 1
      }
      seed = seed.next
    }
  }
}
