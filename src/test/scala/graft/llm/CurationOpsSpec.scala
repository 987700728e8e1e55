package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Behavioral invariants of the round-8 batch-20 curation operators
  * (engine-match vs DuckDB is covered by the `d_boilerplate` /
  * `d_dsir` / `d_ppl_buckets` / `e_kcenter` oracles).
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("dropBoilerplateLines: repeated lines drop everywhere, unique lines survive in order") {
    import spark.implicits._
    val d = Seq(
      (1L, "SUBSCRIBE NOW\nalpha beta\ngamma delta"),
      (2L, "SUBSCRIBE NOW\nepsilon zeta"),
      (3L, "eta theta\nSUBSCRIBE NOW"),
      (4L, "iota kappa\nlambda mu")).toDF("doc_id", "text")
    val out = Dedup.dropBoilerplateLines(d, col("text"), col("doc_id"), minDocs = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("clean_text") == "alpha beta\ngamma delta")
    assert(out(1L).getAs[Long]("n_removed") == 1L)
    assert(out(2L).getAs[String]("clean_text") == "epsilon zeta")
    assert(out(3L).getAs[String]("clean_text") == "eta theta")
    assert(out(4L).getAs[String]("clean_text") == "iota kappa\nlambda mu")
    assert(out(4L).getAs[Long]("n_removed") == 0L)
  }

  test("dropBoilerplateLines: blank lines are exempt; intra-doc repeats don't trigger") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha\n\nbeta"),
      (2L, "gamma\n\ndelta"),
      (3L, "same line\nsame line")).toDF("doc_id", "text")
    val out = Dedup.dropBoilerplateLines(d, col("text"), col("doc_id"), minDocs = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // the empty line repeats across docs 1 and 2 but is never boilerplate
    assert(out(1L).getAs[String]("clean_text") == "alpha\n\nbeta")
    // one doc repeating a line is not cross-document boilerplate
    assert(out(3L).getAs[String]("clean_text") == "same line\nsame line")
    assert(out(3L).getAs[Long]("n_removed") == 0L)
  }

  test("dsirWeights: target-distinctive vocabulary scores above raw-distinctive") {
    import spark.implicits._
    // target docs speak "quality prose words"; raw docs speak "spam"
    val d = (0L until 40L).map { i =>
      if (i < 10) (i, "careful thorough prose sentence structure", true)
      else (i, "buy now click here free offer", false)
    }.toDF("doc_id", "text", "tgt")
    val w = Sampling.dsirWeights(d, col("text"), col("tgt"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("log_weight")).toMap
    val tgtMean = (0L until 10L).map(w).sum / 10
    val rawMean = (10L until 40L).map(w).sum / 30
    assert(tgtMean > rawMean,
      s"target-like docs must outscore raw-like: $tgtMean vs $rawMean")
    // weight is a pure function of content: identical docs, identical weight
    assert(w(15L) == w(16L))
  }

  test("pplBuckets: per-lang thirds partition and bucket ordering follows nll") {
    import spark.implicits._
    val d = (0L until 90L).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      // a unique rare token per doc diluted by a varying common mass
      // → a spread of distinct NLL values on both sides of each cut
      (i, ("common " * (1 + (i % 10)).toInt) + s"tok$i", lang)
    }.toDF("doc_id", "text", "lang")
    val out = TextStats.pplBuckets(d, col("text"), col("lang"), col("doc_id"))
    val counts = out.groupBy("lang", "bucket").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (l <- Seq("en", "fr"); b <- Seq("head", "middle", "tail"))
      assert(counts.getOrElse((l, b), 0L) > 0, s"empty $l/$b")
    // within a language, every head nll <= every tail nll
    val en = out.where(col("lang") === "en")
      .select(col("bucket"), col("nll")).collect()
    val headMax = en.filter(_.getString(0) == "head").map(_.getDouble(1)).max
    val tailMin = en.filter(_.getString(0) == "tail").map(_.getDouble(1)).min
    assert(headMax <= tailMin)
  }

  test("kcenterInit: seed is lowest id, each pick is the current farthest point") {
    import spark.implicits._
    // three tight clusters far apart on a line + a lone outlier
    def v(x: Double) = Array.tabulate(4)(i => if (i == 0) x.toFloat else 0f)
    val vecs = Seq(
      (10L, v(0.0)), (11L, v(0.1)),
      (20L, v(100.0)), (21L, v(100.1)),
      (30L, v(-55.0)),
      (40L, v(50.0))).toDF("vec_id", "embedding")
    val picks = Similarity.kcenterInit(vecs, k = 4)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(picks(0)._1 == 10L && picks(0)._2 == 0.0)
    // distances from the seed: 100.1² beats 100², (−55)², 50² → id 21
    assert(picks(1)._1 == 21L)
    // then the −55 outlier (3025 vs ≤2500 elsewhere), then the 50 point
    assert(picks(2)._1 == 30L)
    assert(picks(3)._1 == 40L)
    assert(picks.map(_._1).toSet.size == 4, "ranks pick distinct vectors")
  }

  test("resampleByWeight: inclusion tracks weight; deterministic across runs") {
    import spark.implicits._
    // 1000 rows, 100 of them with 50× the weight of the rest
    val d = (0L until 1000L).map(i => (i, if (i < 100) 50.0 else 1.0))
      .toDF("doc_id", "w")
    def run() = Sampling.resampleByWeight(d, col("doc_id"), col("w"), k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val a = run()
    assert(a == run(), "A-ES draw must be deterministic")
    val heavy = a.map(_._1).count(_ < 100L)
    assert(heavy > 50, s"heavy rows under-sampled: $heavy/100")
    assert(a.map(_._2).sorted == (1L to 100L), "ranks are 1..k")
  }

  test("qualityClassifier: clean English prose keeps, symbol soup drops") {
    import spark.implicits._
    val d = Seq(
      (1L, ("the quick brown fox jumps over the lazy dog and " * 8).trim),
      (2L, "@@ ### $$$$ %% ^^^^ && ** (()) 123 456 789 000 !!!")).toDF("doc_id", "text")
    val out = TextStats.qualityClassifier(d, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(out(1L)._2, s"clean prose dropped: ${out(1L)}")
    assert(!out(2L)._2, s"symbol soup kept: ${out(2L)}")
    assert(out(1L)._1 > out(2L)._1)
  }

  test("blocklistSignals: hard terms drop instantly, frequency terms only past the cap") {
    import spark.implicits._
    val d = Seq(
      (1L, "clean words only here today"),
      (2L, "bad bad bad clean words"),          // 3/5 = 0.6 > cap
      (3L, "one bad among many many clean words here"), // 1/8 ≤ cap
      (4L, "totally fine except nuke")).toDF("doc_id", "text")
    val out = d.select(col("doc_id") +: TextStats.blocklistSignals(col("text"),
        blocked = Seq("bad"), hardBlock = Seq("nuke"), maxRatio = 0.2): _*)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((0L, false, true)))
    assert(out(2L) == ((3L, false, false)))
    assert(out(3L) == ((1L, false, true)))
    assert(out(4L) == ((0L, true, false)), "hard term must drop regardless of ratio")
  }

  test("shardManifest: checksum is order-insensitive and mutation-sensitive") {
    import spark.implicits._
    val d = (0L until 200L).map(i => (i, s"document number $i content")).toDF("doc_id", "text")
    val m1 = Sampling.shardManifest(d, col("text"), shards = 4)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    assert(m1.keySet == Set(0, 1, 2, 3))
    assert(m1.values.map(_._1).sum == 200L)
    // row order must not matter
    val m2 = Sampling.shardManifest(d.orderBy(col("doc_id").desc), col("text"), shards = 4)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    assert(m1 == m2)
    // a single mutated document must change exactly its shard's checksum
    val mutated = d.withColumn("text",
      when(col("doc_id") === 7L, lit("TAMPERED")).otherwise(col("text")))
    val m3 = Sampling.shardManifest(mutated, col("text"), shards = 4)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    assert(m1 != m3)
    assert(m1.count { case (k, v) => m3(k) != v } == 1)
  }

  test("snapshotDiff: identical snapshots are all unchanged; each edit class lands once") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val same = graft.llm.Pipeline.snapshotDiff(v1, v1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(same == Map("unchanged" -> 3L))
    val v2 = Seq((1L, "a"), (2L, "B!"), (9L, "new")).toDF("doc_id", "text")
    val diff = graft.llm.Pipeline.snapshotDiff(v1, v2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diff == Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L), diff.toString)
  }

  test("lshPlan: b*r = n, s50 tracks the threshold, and the plan beats naive extremes") {
    val (b, r, s50, fp, fn) = Dedup.lshPlan(128, 0.8)
    assert(b * r == 128)
    assert(math.abs(s50 - 0.8) < 0.15, s"s50 $s50 far from 0.8")
    // error of the chosen plan is no worse than the 1-band and n-band extremes
    def err(bb: Int, rr: Int): Double = {
      val steps = 1000
      (0 until steps).map { i =>
        val s = (i + 0.5) / steps
        val p = 1.0 - math.pow(1.0 - math.pow(s, rr), bb)
        if (s < 0.8) p / steps else (1.0 - p) / steps
      }.sum
    }
    assert(fp + fn <= err(1, 128) + 1e-12)
    assert(fp + fn <= err(128, 1) + 1e-12)
  }
}
