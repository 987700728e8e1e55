package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Jaccard size-ratio pre-filter
  * ([[Dedup.jaccardSizeBound]]): the bound is a NECESSARY condition
  * for `jaccard >= t` — no qualifying pair is ever pruned — so the
  * exact filter that follows it keeps results identical while the
  * merge kernel is skipped for size-mismatched pairs (round-16
  * optimization).
  */
class JaccardBoundSpec extends AnyFunSuite {

  private def jaccard(a: Set[String], b: Set[String]): Double = {
    val u = (a union b).size
    if (u == 0) 0.0 else (a intersect b).size.toDouble / u
  }

  private def bound(a: Set[String], b: Set[String], t: Double): Boolean =
    math.min(a.size, b.size).toDouble >= t * math.max(a.size, b.size)

  test("bound is necessary: J(a,b) >= t implies the size bound, for random sets") {
    val rnd = new scala.util.Random(421)
    val universe = (1 to 30).map(_.toString)
    (0 until 5000).foreach { _ =>
      val a = universe.filter(_ => rnd.nextBoolean()).toSet
      val b = universe.filter(_ => rnd.nextDouble() < 0.4).toSet
      val t = 0.05 + rnd.nextDouble() * 0.9
      if (jaccard(a, b) >= t) assert(bound(a, b, t),
        s"bound pruned a qualifying pair: |a|=${a.size} |b|=${b.size} " +
          s"J=${jaccard(a, b)} t=$t")
    }
  }

  test("bound prunes provably-failing pairs (min < t*max implies J < t)") {
    // contrapositive sanity on a concrete family: subset pairs where
    // the small side is under the ratio
    val big = (1 to 100).map(_.toString).toSet
    val small = (1 to 10).map(_.toString).toSet // J = 0.1
    assert(!bound(small, big, 0.5))
    assert(jaccard(small, big) < 0.5)
  }

  test("SQL spelling agrees with the reference semantics on a DataFrame") {
    val spark = graft.SparkTestBase.spark
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (Seq("a", "b", "c"), Seq("a", "b", "c", "d")),     // J=0.75
      (Seq("a"), Seq.empty[String]),                     // empty side
      (Seq("a", "b"), Seq("x", "y", "z", "w", "v", "u")) // size-mismatched
    )
    val df = spark.createDataFrame(rows).toDF("a", "b")
      .withColumn("bnd", Dedup.jaccardSizeBound(col("a"), col("b"), 0.5))
    val got = df.select("bnd").collect().map(_.getBoolean(0)).toSeq
    val want = rows.map { case (a, b) => bound(a.toSet, b.toSet, 0.5) }
    assert(got == want)
  }
}
