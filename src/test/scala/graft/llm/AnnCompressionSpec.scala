package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Behavioral invariants of SQ8 / MRL search and proper winnowing
  * (engine-match vs DuckDB is covered by the `e_sq8_search` /
  * `e_mrl_search` / `d_winnow` oracles).
  */
class AnnCompressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("sq8: codes stay in [0,255] and dequantized search agrees with brute L2 at top ranks") {
    val (mins, scales) = Similarity.sq8Train(vecs, dim = 64)
    assert(mins.length == 64 && scales.forall(_ > 0))
    val enc = Similarity.sq8Encode(vecs, mins, scales)
    val bad = enc.where(exists(col("codes"), c => c < 0 || c > 255)).count()
    assert(bad == 0, "codes out of byte range")
    // 8-bit quantization noise must not destroy neighbor structure:
    // ≥ 3 of the exact top-5 survive per query on average
    val q = vecs.where(col("vec_id") < 5)
    val approx = Similarity.sq8Search(vecs, q, k = 5, dim = 64)
      .select(col("query_id"), col("neighbor_id"))
    val exactNN = Similarity.bruteKnn(vecs, q, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val hits = approx.join(exactNN, Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(hits >= 15, s"SQ8 overlap with exact top-5 too low: $hits/25")
  }

  test("mrl: full-width rerank scores equal brute cosine for the kept neighbors") {
    val q = vecs.where(col("vec_id") < 5)
    val mrl = Similarity.mrlSearch(vecs, q, k = 5, coarseDim = 16, rerank = 20)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    val brute = Similarity.bruteKnn(vecs, q, k = 200)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bsim"))
    val joined = mrl.join(brute, Seq("query_id", "neighbor_id"))
    assert(joined.count() == mrl.count(), "every MRL hit exists in the brute ranking")
    assert(joined.where(col("sim") =!= col("bsim")).count() == 0,
      "rerank scores must be the exact full-dim cosine")
  }

  test("bq: codes match a driver-side sign fold; full-width shortlist degenerates to brute") {
    val n = vecs.count().toInt
    val enc = Similarity.bqEncode(vecs, dim = 64)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val raw = vecs.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](r.fieldIndex("embedding"))))
    raw.foreach { case (id, emb) =>
      var lo = 0L; var hi = 0L
      for (i <- 0 until 32) if (emb(i) >= 0f) lo |= 1L << i
      for (i <- 32 until 64) if (emb(i) >= 0f) hi |= 1L << (i - 32)
      assert(enc(id) == ((lo, hi)), s"code mismatch for $id")
    }
    // rerank covering the whole corpus ⇒ the Hamming stage prunes
    // nothing and bq == brute exactly
    val q = vecs.where(col("vec_id") < 5)
    val full = Similarity.bqSearch(vecs, q, k = 5, rerank = n, dim = 64)
      .collect().map(r => (r.getLong(0), r.get(1).toString.toLong, r.getLong(2))).toSet
    val brute = Similarity.bruteKnn(vecs, q, k = 5)
      .collect().map(r => (r.getLong(0), r.get(1).toString.toLong, r.getLong(2))).toSet
    assert(full == brute)
    // planted-duplicate invariant: an exact copy has Hamming 0, so it
    // must survive ANY shortlist and rerank to rank 1 at cosine 1
    val planted = vecs.select(col("vec_id"), col("embedding")).union(
      q.select((col("vec_id") + lit(100000L)).as("vec_id"), col("embedding")))
    val got = Similarity.bqSearch(planted, q, k = 1, rerank = 3, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    (0L until 5L).foreach { id =>
      assert(got(id) == id + 100000L, s"planted duplicate of $id not at rank 1")
    }
  }

  test("rp: projection matches a driver-side md5-parity replay; full shortlist degenerates to brute") {
    import spark.implicits._
    // sign matrix replay: same salt string, same md5 parity
    def sign(j: Int, i1: Int): Double =
      if (Sampling.hashBits60Local(s"rp|$j|$i1") % 2 == 0) 1.0 else -1.0
    val rows = vecs.limit(3)
      .select(col("vec_id"), col("embedding"),
        Similarity.rpProject(col("embedding"), 64, 8).as("p"))
      .collect()
    rows.foreach { r =>
      val emb = r.getSeq[Float](1)
      val got = r.getSeq[Double](2)
      for (j <- 0 until 8) {
        var acc = 0.0
        for (i <- emb.indices) acc += emb(i).toDouble * sign(j, i + 1)
        assert(got(j) == acc, s"vec ${r.getLong(0)} dim $j")
      }
    }
    // rerank ≥ corpus − 1 ⇒ the projected prefilter rejects nothing
    // and rpSearch must equal brute exactly, normalization included
    val n = vecs.count().toInt
    val q = vecs.where(col("vec_id") < 3)
    val full = Similarity.rpSearch(vecs, q, k = 5, rerank = n, dim = 64, m = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    val brute = Similarity.bruteKnn(vecs, q, k = 5)
      .select(col("query_id"), col("rank").cast("long"), col("neighbor_id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    assert(full.sameElements(brute))
    // a zero vector projects to exact zeros (rpProject is division-
    // free; rpSearch's norm guard then keeps the prefilter from
    // raising ANSI DIVIDE_BY_ZERO — the exact-cosine rerank still
    // rejects zero vectors, like every cosine path in this family)
    val z = Seq((99L, Array.fill(64)(0f))).toDF("vec_id", "embedding")
    val zp = z.select(Similarity.rpProject(col("embedding"), 64, 8).as("p"))
      .collect()(0).getSeq[Double](0)
    assert(zp.forall(_ == 0.0))
  }

  test("winnow: the Schleimer guarantee — docs sharing a ≥ k+w−1 word span share a fingerprint") {
    import spark.implicits._
    // k=5, w=4 → any shared span of ≥ 8 words guarantees a common fp
    val span = "alpha bravo charlie delta echo foxtrot golf hotel"
    val d = Seq(
      (1L, s"one two three $span nine ten"),
      (2L, s"$span completely different tail words here"),
      (3L, "nothing in common with the others at all ok")).toDF("doc_id", "text")
    val fps = d.select(col("doc_id"), Dedup.winnow(col("text"), 5, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty, "shared span must share a fingerprint")
    assert((fps(1L) intersect fps(3L)).isEmpty)
    // short docs (< w windows) fall back to the whole-doc minimum
    val shortDoc = Seq((9L, "just five words of text")).toDF("doc_id", "text")
    val sfp = shortDoc.select(Dedup.winnow(col("text"), 5, 4).as("fps"))
      .head().getSeq[Long](0)
    assert(sfp.length == 1)
  }
}
