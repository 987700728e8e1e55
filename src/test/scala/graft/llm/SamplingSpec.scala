package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Invariants of the deterministic sampling/sharding/packing kernels
  * (engine-match vs DuckDB is covered by the `d_sample_strat` /
  * `d_split` / `d_shard` / `d_pack` oracles).
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def docs = {
    import spark.implicits._
    (0L until 1000L).map(i => (i, ("w " * (i % 97 + 1).toInt).trim))
      .toDF("doc_id", "text")
  }

  test("fimTransform: the three spans reassemble to the original text") {
    import spark.implicits._
    val src = docs.limit(200).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val out = Sampling.fimTransform(docs.limit(200), col("text"), col("doc_id"))
      .collect()
    assert(out.length == 200)
    out.foreach { r =>
      val (id, pl, ml, fim) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val text = src(id)
      assert(fim.startsWith("<PRE>"))
      val pre = fim.substring(5, fim.indexOf("<SUF>"))
      val suf = fim.substring(fim.indexOf("<SUF>") + 5, fim.indexOf("<MID>"))
      val mid = fim.substring(fim.indexOf("<MID>") + 5)
      assert(pre + mid + suf == text, s"spans of $id must reassemble the doc")
      assert(pre.length == pl && mid.length == ml)
      assert(pl + ml <= text.length)
    }
    // cut points vary across docs (the hash actually moves)
    assert(out.map(_.getLong(1)).distinct.length > 10)
  }

  test("spanCorrupt: substituting targets back into corrupted reconstructs the text") {
    val src = docs.limit(200).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val out = Sampling.spanCorrupt(docs.limit(200), col("text"), col("doc_id"))
      .collect()
    assert(out.length == 200)
    var masked = 0L
    out.foreach { r =>
      val (id, n, corr, tgt) =
        (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))
      val spans = "<X_\\d+> ?".r.split(tgt).filter(_.nonEmpty).map(_.trim)
      assert(spans.length == n, s"doc $id: $n spans declared, ${spans.length} in targets")
      val rebuilt = corr.split(" ").map { t =>
        if (t.matches("<X_\\d+>")) spans(t.drop(3).dropRight(1).toInt - 1) else t
      }.mkString(" ")
      assert(rebuilt == src(id), s"doc $id must reconstruct")
      masked += spans.map(_.split(" ").length).sum
    }
    val total = src.values.map(_.split(" ").length).sum
    // the coin rate is 0.15/position; spans make the realized masked
    // fraction concentrate near it
    assert(masked > total * 0.10 && masked < total * 0.20,
      s"masked fraction off: $masked/$total")
  }

  test("splitGrouped: every member of a group lands in the same split") {
    import spark.implicits._
    // 200 docs in 40 groups of 5
    val df = (0L until 200L).map(i => (i, i / 5L)).toDF("doc_id", "grp")
    val out = Sampling.splitGrouped(df,
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)),
      org.apache.spark.sql.functions.col("grp"))
    val perGroup = out.groupBy("grp")
      .agg(org.apache.spark.sql.functions.countDistinct("split").as("n"))
      .collect().map(_.getLong(1))
    assert(perGroup.forall(_ == 1L))
    // and the split is the id-keyed split of the group key (same draw)
    val byKey = Sampling.split(
      df.select(org.apache.spark.sql.functions.col("grp").as("doc_id")).distinct(),
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val got = out.select("grp", "split").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == byKey)
  }

  test("hash01 is deterministic and uniform-ish") {
    val u = docs.select(Sampling.hash01(col("doc_id")).as("u"))
    val again = docs.select(Sampling.hash01(col("doc_id")).as("u"))
    assert(u.collect().map(_.getDouble(0)).toSeq ==
      again.collect().map(_.getDouble(0)).toSeq)
    val mean = u.agg(avg("u")).head().getDouble(0)
    assert(math.abs(mean - 0.5) < 0.05, s"mean $mean")
    assert(u.where(col("u") < 0.0 || col("u") >= 1.0).count() == 0)
    // salted draws are independent of unsalted ones
    val corr = docs.select(
      Sampling.hash01(col("doc_id")).as("a"),
      Sampling.hash01(col("doc_id"), "other").as("b"))
      .agg(avg(when(col("a") < 0.5 && col("b") < 0.5, 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(math.abs(corr - 0.25) < 0.06, s"joint <0.5 rate $corr")
  }

  test("mixtureReport: shares sum to 1; tau=1 is the natural mix; tau<1 lifts the tail") {
    import spark.implicits._
    val d = Seq.tabulate(300)(i =>
      (i.toLong, "a b c d", if (i < 240) "big" else "small"))
      .toDF("doc_id", "text", "source")
    val nat = Sampling.mixtureReport(d, col("source"),
      TextStats.tokensWhitespace(col("text")), tau = 1.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    // equal-length docs: token share = doc share; tau=1 keeps it
    assert(nat("big") == ((240L, 960L, 0.8, 0.8)))
    assert(nat("small") == ((60L, 240L, 0.2, 0.2)))
    // tau<1 compresses the ratio toward uniform: the tail's weight
    // rises above its natural share, the head's falls; still sums to 1
    val temp = Sampling.mixtureReport(d, col("source"),
      TextStats.tokensWhitespace(col("text")), tau = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(temp("small") > 0.2 && temp("big") < 0.8)
    assert(math.abs(temp.values.sum - 1.0) < 1e-5)
  }

  test("split labels by the cumulative fraction ladder, realized near quota") {
    val out = Sampling.split(docs, Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 700 && counts("train") < 900, counts.toString)
    assert(out.count() == 1000)
    assertThrows[IllegalArgumentException] {
      Sampling.split(docs, Seq(("a", 0.5), ("b", 0.2)))
    }
  }

  test("shardAssign gives dense per-shard positions and a stable permutation") {
    val out = Sampling.shardAssign(docs, shards = 8).cache()
    assert(out.count() == 1000)
    // pos is dense 0..n_s-1 within each shard
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("d"))
      .where(col("mx") =!= col("n") - 1 || col("mn") =!= 0 || col("d") =!= col("n"))
    assert(bad.count() == 0)
    assert(out.select("shard").distinct().count() == 8)
    out.unpersist()
    ()
  }

  test("temperatureSample: tau<1 upsamples tail keys, rates cap at 1, deterministic") {
    import spark.implicits._
    // 900 'big' vs 100 'small': natural shares 0.9/0.1; tau=0.5
    // tempers to ~0.75/0.25 of the kept set
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (901 to 1000).map(i => (i.toLong, "small"))).toDF("doc_id", "k")
    val kept = Sampling.temperatureSample(df, col("k"), tau = 0.5, targetFraction = 0.3)
      .select("doc_id", "k").collect().map(r => (r.getLong(0), r.getString(1)))
    val byKey = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // expected rates: w_big = .9^.5/Z, w_small = .1^.5/Z with
    // Z = .9^.5+.1^.5 → kept share big ≈ 0.75, small ≈ 0.25 of 300
    assert(math.abs(byKey("big") - 225.0) < 40, s"big=${byKey("big")}")
    assert(math.abs(byKey("small") - 75.0) < 25, s"small=${byKey("small")}")
    // deterministic: a second run selects the identical ids
    val again = Sampling.temperatureSample(df, col("k"), tau = 0.5, targetFraction = 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
    // a tiny key with rate capped at 1 keeps everything
    val capped = Sampling.temperatureSample(df, col("k"), tau = 0.1, targetFraction = 0.9)
    val smallKept = capped.where(col("k") === "small").count()
    assert(smallKept == 100L)
  }

  test("packSequences: offsets are the running token stream; bins chop at the budget") {
    val out = Sampling.packSequences(
      docs, TextStats.tokensWhitespace(col("text")), budget = 128L, shards = 4)
    val rows = out.select("shard", "pos", "tokens", "offset", "bin")
      .collect()
      .groupBy(_.getInt(0)).map { case (s, rs) => s -> rs.sortBy(_.getLong(1)) }
    rows.foreach { case (_, rs) =>
      var expect = 0L
      rs.foreach { r =>
        assert(r.getLong(3) == expect, s"offset at pos ${r.getLong(1)}")
        assert(r.getLong(4) == r.getLong(3) / 128L)
        expect += r.getLong(2)
      }
    }
  }

  test("mixtureApply: tail sources repeat by their epoch count, heads thin") {
    import spark.implicits._
    // A: 90 docs × 100 tokens, B: 10 docs × 100 tokens; tau = 0.5 →
    // wA = 0.75, wB = 0.25 → epochs_A = 0.8333…, epochs_B = 2.5
    val docs = (0 until 90).map(i => (i.toLong, "A", ("w " * 100).trim)) ++
      (0 until 10).map(i => (100L + i, "B", ("w " * 100).trim))
    val df = docs.toDF("doc_id", "source", "text")
    val out = Sampling.mixtureApply(df, col("source"),
        TextStats.tokensWhitespace(col("text")), tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3)))
    val byDoc = out.groupBy(_._1)
    // every emitted row carries the source's epoch count
    assert(out.filter(_._2 == "A").forall(_._3 == 0.833333))
    assert(out.filter(_._2 == "B").forall(_._3 == 2.5))
    // B docs repeat 2 or 3 times with contiguous copy indices
    val bCounts = (0 until 10).map(i => byDoc.get(100L + i).map(_.length).getOrElse(0))
    assert(bCounts.forall(c => c == 2 || c == 3), bCounts.toString)
    byDoc.foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (0L until rs.length.toLong))
    }
    // A docs appear at most once; the realized fraction tracks 0.833
    val aKept = (0 until 90).count(i => byDoc.contains(i.toLong))
    assert(byDoc.filter(_._1 < 90L).forall(_._2.length == 1))
    assert(aKept > 55 && aKept <= 90, s"aKept $aKept")
    // deterministic under re-run
    val again = Sampling.mixtureApply(df, col("source"),
        TextStats.tokensWhitespace(col("text")), tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again == out.map(t => (t._1, t._4)).toSet)
  }

  test("chunkTokens: stride overlap, partial tail, full coverage") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "only"),                                   // single token
      (3L, (1 to 4).map(i => s"u$i").mkString(" ")))  // window-sized
      .toDF("doc_id", "text")
    val out = Sampling.chunkTokens(d, col("text"), window = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    // doc 1: starts 0,3,6,9 — neighbors share window-stride=1 token
    assert(out.filter(_._1 == 1L).map(t => (t._2, t._3, t._4, t._5)).toSeq == Seq(
      (0L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 3L, 4L, "t4 t5 t6 t7"),
      (2L, 6L, 4L, "t7 t8 t9 t10"),
      (3L, 9L, 1L, "t10")))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 1L, "only")))
    assert(out.filter(_._1 == 3L).map(_._5).toSeq == Seq("u1 u2 u3 u4", "u4"))
    // every token of doc 1 appears in some chunk
    val covered = out.filter(_._1 == 1L).flatMap(_._5.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
  }

  test("tokenBudget: best-quality prefix within budget, exact running total") {
    import spark.implicits._
    // quality = 0.5*min(n/64,1) + 0.5*alphaRatio; all-alpha texts rank
    // purely by word count here, ties broken by doc_id ascending.
    val docs = (1L to 40L).map(i =>
      (i, (0 until (if (i <= 10) 60 else 10)).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Sampling.tokenBudget(docs, col("text"), budget = 630L, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .sortBy(_._3)
    // ten 60-token docs (q≈0.73) fill 600; the 10-token docs (q≈0.41)
    // follow by id: 11 at 610, 12 at 620, 13 exactly at the 630 cap.
    assert(out.map(_._1).toSeq == ((1L to 10L) ++ Seq(11L, 12L, 13L)))
    // the running total is the exact global cumulative sum in rank order
    assert(out.map(_._3).toSeq == (1 to 10).map(_ * 60L) ++ Seq(610L, 620L, 630L))
    // determinism across runs (range partition boundaries must not
    // leak into the result)
    val again = Sampling.tokenBudget(docs, col("text"), budget = 630L, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._3)
    assert(again.toSeq == out.toSeq)
  }

  test("weighted sampling: heavy weights dominate, heap top-k plan, deterministic") {
    import spark.implicits._
    // 10 rows at weight 10^6 vs 1000 rows at weight 1: with keys
    // u^(1/w) the heavy keys sit near 1, so k=10 is ~all heavy
    val rows = (0L until 10L).map(i => (i, 1000000L)) ++
      (1000L until 2000L).map(i => (i, 1L))
    val df = rows.toDF("doc_id", "w")
    val out = Sampling.sampleWeighted(df, col("doc_id"), col("w"), k = 10)
    assert(out.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"), "top-k must be a heap, not a sort")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length == 10)
    assert(got.map(_._2).sorted.toSeq == (1L to 10L))
    val heavy = got.count(_._1 < 10L)
    assert(heavy >= 8, s"only $heavy heavy rows selected")
    // deterministic: same hash, same sample
    val again = Sampling.sampleWeighted(df, col("doc_id"), col("w"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(again.toSeq == got.toSeq)
  }

  test("cropPairs: contiguous slices, md5 starts, overlap formula, short docs drop") {
    import spark.implicits._
    val docs = Seq(
      (7L, "a b c d e f g h i j"), // 10 tokens → crops of 5
      (8L, "one two three"),       // 3 tokens < minTokens → dropped
      (9L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Sampling.cropPairs(docs, col("text"), col("doc_id")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(7L))
    val r = out.head
    val toks = "a b c d e f g h i j".split(" ")
    val l = 5
    val sa = (Sampling.hashBits60Local("7|cropa") % (10 - l + 1)).toInt
    val sb = (Sampling.hashBits60Local("7|cropb") % (10 - l + 1)).toInt
    assert(r.getLong(1) == l)
    assert(r.getString(2) == toks.slice(sa, sa + l).mkString(" "))
    assert(r.getString(3) == toks.slice(sb, sb + l).mkString(" "))
    assert(r.getLong(4) == math.max(0, l - math.abs(sa - sb)))
  }
}
