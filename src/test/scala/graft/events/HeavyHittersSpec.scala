package graft.events

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Distributed weighted Misra–Gries heavy hitters. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("kernel: exact when capacity is never exceeded") {
    val s = new HeavyHitters.MgSummary(8)
    Seq("a" -> 3L, "b" -> 1L, "a" -> 2L, "c" -> 4L).foreach { case (k, w) => s.add(k, w) }
    assert(s.decremented == 0L)
    assert(s.entries.toSeq == Seq(("a", 5L), ("c", 4L), ("b", 1L)))
  }

  test("kernel: bounds contain true counts under any capacity (randomized)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val n = 200 + rnd.nextInt(300)
      val keys = Array.fill(n)(("k" + rnd.nextInt(30), 1L + rnd.nextInt(5)))
      val truth = keys.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      val cap = 2 + rnd.nextInt(12)
      val s = new HeavyHitters.MgSummary(cap)
      keys.foreach { case (k, w) => s.add(k, w) }
      assert(s.size <= cap)
      val got = s.entries.toMap
      got.foreach { case (k, c) =>
        assert(c <= truth(k), s"trial $trial: lo bound must undercount")
        assert(c + s.decremented >= truth(k), s"trial $trial: hi bound must cover")
      }
      // every unreported key's true weight is bounded by the error term
      (truth.keySet -- got.keySet).foreach { k =>
        assert(truth(k) <= s.decremented, s"trial $trial: missed a heavy key")
      }
    }
  }

  test("kernel: merge keeps the same guarantee as a single summary") {
    val rnd = new scala.util.Random(7)
    val all = Array.fill(500)(("k" + rnd.nextInt(25), 1L + rnd.nextInt(3)))
    val truth = all.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val (h1, h2) = all.splitAt(250)
    val s1 = new HeavyHitters.MgSummary(10)
    val s2 = new HeavyHitters.MgSummary(10)
    h1.foreach { case (k, w) => s1.add(k, w) }
    h2.foreach { case (k, w) => s2.add(k, w) }
    s1.merge(s2)
    assert(s1.size <= 10)
    val got = s1.entries.toMap
    got.foreach { case (k, c) =>
      assert(c <= truth(k) && c + s1.decremented >= truth(k))
    }
    (truth.keySet -- got.keySet).foreach(k => assert(truth(k) <= s1.decremented))
  }

  test("heavyHitters: exact (hi == lo) when capacity dominates cardinality") {
    import spark.implicits._
    val df = Seq.tabulate(300)(i => ("u" + (i % 7), 1L)).toDF("k", "w")
      .repartition(4)
    val out = HeavyHitters.heavyHitters(df, col("k"), col("w"), k = 5, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 300 rows over 7 keys: residues 0..5 get 43, u6 gets 42
    assert(out.length == 5)
    assert(out.forall { case (_, lo, hi, _) => lo == hi })
    assert(out.take(2).toSeq == Seq(("u0", 43L, 43L, 1L), ("u1", 43L, 43L, 2L)))
    assert(out.map(_._4).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("heavyHitters distributed == exact counting in the exact regime (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(314159)
    for (trial <- 1 to 3) {
      val n = 400 + rnd.nextInt(400)
      val rows = Seq.fill(n)(("k" + rnd.nextInt(40), 1L + rnd.nextInt(4)))
      val k = 3 + rnd.nextInt(10)
      val got = HeavyHitters.heavyHitters(
          rows.toDF("key", "w").repartition(5), col("key"), col("w"),
          k, capacity = 256)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val truth = rows.groupBy(_._1).map { case (key, v) => key -> v.map(_._2).sum }
      val expected = truth.toSeq.map { case (key, c) => (c, key) }
        .sortBy { case (c, key) => (-c, key) }.take(k).zipWithIndex
        .map { case ((c, key), i) => (key, c, c, i + 1L) }
      assert(got.toSeq == expected, s"trial $trial (k=$k) diverged from exact")
    }
  }

  test("exactTopK: certified result equals brute-force top-k, even under decrements") {
    import spark.implicits._
    val rnd = new scala.util.Random(8128)
    // skewed: a few heavy keys over diffuse noise — tiny capacity
    // forces evictions, but the heavy keys' counts beat the eviction
    // mass so the certification holds
    val rows = (Seq.fill(300)("hot1") ++ Seq.fill(250)("hot2") ++ Seq.fill(200)("hot3") ++
      Seq.fill(400)("n" + rnd.nextInt(100))).map((_, 1L)) ++
      Seq.fill(400)(("n" + rnd.nextInt(100), 1L))
    val out = HeavyHitters.exactTopK(
        rows.toDF("key", "w").repartition(4), col("key"), col("w"), k = 3, capacity = 24)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val truth = rows.groupBy(_._1).map { case (key, v) => key -> v.map(_._2).sum }
    val expected = truth.toSeq.sortBy { case (key, c) => (-c, key) }.take(3)
      .zipWithIndex.map { case ((key, c), i) => (key, c, i + 1L) }
    // the fixture is built so the heavy keys beat the eviction mass:
    // certification MUST hold here, and then the result must be the
    // true top-k with exact counts
    assert(out.head._4, s"fixture must certify: ${out.toSeq}")
    assert(out.map(t => (t._1, t._2, t._3)).toSeq == expected)
    assert(out.map(_._1).toSet == Set("hot1", "hot2", "hot3"),
      s"heavy keys must win: ${out.toSeq}")
    // counts are exact for reported keys regardless of certification
    out.foreach { case (key, c, _, _) => assert(c == truth(key)) }
  }

  test("exactTopK: certification goes false when the tail is ambiguous") {
    import spark.implicits._
    // near-uniform keys with capacity far below cardinality: eviction
    // mass dwarfs any single count — certifying would be unsound
    val rows = (0 until 600).map(i => ("u" + (i % 200), 1L))
    val out = HeavyHitters.exactTopK(
        rows.toDF("key", "w").repartition(6), col("key"), col("w"), k = 5, capacity = 8)
      .collect()
    assert(out.nonEmpty && out.forall(!_.getBoolean(3)),
      "uniform stream at capacity 8/200 keys must not certify")
  }

  test("heavyHitters: under pressure the heavy key survives with covering bounds") {
    import spark.implicits._
    // one key carries half the stream; 200 noise keys; capacity 16
    val rows = (Seq.fill(400)("hot") ++ (0 until 400).map(i => "n" + (i % 200)))
    val df = rows.map((_, 1L)).toDF("k", "w").repartition(8)
    val out = HeavyHitters.heavyHitters(df, col("k"), col("w"), k = 3, capacity = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val hot = out.find(_._1 == "hot")
    assert(hot.isDefined, "heavy key must be reported")
    assert(hot.get._2 <= 400L && hot.get._3 >= 400L, s"bounds must cover truth: $hot")
  }
}
