package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** REAL JDK codecs in Multimodal: PNG round trips pixel-exactly
  * (lossless), resize lands on the target grid, WAV decode recovers
  * the sine's RMS and zero-crossing rate — the decode step is no
  * longer a stub for image/audio.
  */
class ImageCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("pngBytes → ImageIO.read round trip is pixel-exact") {
    val seed = "the quick brown fox".getBytes("UTF-8")
    val png = Multimodal.pngBytes(seed, 7, 5)
    // a genuine PNG: magic bytes present
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 7 && img.getHeight == 5)
    // pixels match the generator formula exactly (PNG is lossless)
    for (y <- 0 until 5; x <- 0 until 7) {
      val i = y * 7 + x
      val r = seed(i % seed.length) & 0xff
      val g = seed((i * 31 + 7) % seed.length) & 0xff
      val b = (i * 131) & 0xff
      assert((img.getRGB(x, y) & 0xffffff) == ((r << 16) | (g << 8) | b),
        s"pixel ($x,$y)")
    }
  }

  test("extractImageFeatures: decoded dims + channel means match a local decode") {
    import spark.implicits._
    val docs = Seq((3L, "alpha beta"), (17L, "gamma")).toDF("doc_id", "text")
    val out = Multimodal.extractImageFeatures(
        Multimodal.withPngPayload(docs), bins = 4)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    for (row <- out) {
      val id = row.getLong(0)
      val text = if (id == 3L) "alpha beta" else "gamma"
      val w = (4 + (id % 13)).toInt
      val h = (4 + (id % 11)).toInt
      assert(row.getInt(1) == w && row.getInt(2) == h)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.pngBytes(text.getBytes("UTF-8"), w, h)))
      val expect = Multimodal.imageFeatures(img, 4)
      val got = row.getSeq[Double](3)
      assert(got.size == 3 + 4)
      expect.zip(got).foreach { case (e, g) => assert(math.abs(e - g) < 1e-12) }
      // luminance histogram is a distribution
      assert(math.abs(got.drop(3).sum - 1.0) < 1e-9)
    }
  }

  test("resizeImages: nearest-neighbor rescale to the target grid, re-decodable") {
    import spark.implicits._
    val docs = Seq((9L, "some pixels here")).toDF("doc_id", "text")
    val out = Multimodal.resizeImages(Multimodal.withPngPayload(docs), 4, 3)
      .collect().head
    assert(out.getStruct(2).getInt(0) == 4 && out.getStruct(2).getInt(1) == 3)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]]("payload")))
    assert(img.getWidth == 4 && img.getHeight == 3)
    // the PINNED index formula: dst (x,y) = src (x·srcW/dstW, y·srcH/dstH)
    // (floor division) — what makes the resize SQL-reproducible
    val srcW = (4 + (9L % 13)).toInt; val srcH = (4 + (9L % 11)).toInt
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.pngBytes("some pixels here".getBytes("UTF-8"), srcW, srcH)))
    for (y <- 0 until 3; x <- 0 until 4)
      assert((img.getRGB(x, y) & 0xffffff) ==
        (src.getRGB(x * srcW / 4, y * srcH / 3) & 0xffffff), s"dst ($x,$y)")
  }

  test("nearestNeighbor kernel matches the formula on a non-integral ratio") {
    val src = new java.awt.image.BufferedImage(
      7, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 7) src.setRGB(x, y, (y * 7 + x) * 1001)
    val dst = Multimodal.nearestNeighbor(src, 3, 2)
    for (y <- 0 until 2; x <- 0 until 3)
      assert((dst.getRGB(x, y) & 0xffffff) ==
        (src.getRGB(x * 7 / 3, y * 5 / 2) & 0xffffff))
    // upscale too: each dst pixel replicates its floor-mapped source
    val up = Multimodal.nearestNeighbor(src, 14, 5)
    for (y <- 0 until 5; x <- 0 until 14)
      assert((up.getRGB(x, y) & 0xffffff) == (src.getRGB(x / 2, y) & 0xffffff))
  }

  test("WAV round trip: RMS ≈ amp/√2 and zero-crossing rate ≈ 2·freq·duration") {
    val id = 42L
    val wav = Multimodal.wavBytes(id) // freq = 200 + 42 = 242 Hz, 800 samples @ 8 kHz
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    val Some((n, rms, zc)) = Multimodal.audioFeatures(wav)
    assert(n == 800L)
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01)
    val expectedZc = 2.0 * 242.0 * (800.0 / 8000.0) // ≈ 48.4
    assert(math.abs(zc - expectedZc) <= 2)
  }

  test("corrupt payloads are skipped, not fatal") {
    import spark.implicits._
    val docs = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    assert(Multimodal.extractImageFeatures(docs, bins = 4).count() == 0L)
    assert(Multimodal.audioFeatures(Array[Byte](9, 9)).isEmpty)
  }

  test("registered m_png/m_wav queries run on testdata with full coverage") {
    val sfDir = "/root/testdata/sf0.001"
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val feat = graft.SparkEntry.queries("m_png_features")(spark, sfDir)
    assert(feat.count() == nDocs) // every payload decoded — none dropped
    val res = graft.SparkEntry.queries("m_png_resize")(spark, sfDir)
      .agg(min("width"), max("width"), min("height"), max("height")).collect().head
    assert(res.getLong(0) == 4L && res.getLong(1) == 4L &&
      res.getLong(2) == 3L && res.getLong(3) == 3L)
    assert(graft.SparkEntry.queries("m_wav_features")(spark, sfDir).count() == nDocs)
  }

  test("dhashClusters == CC over the full pair graph (collapse equivalence)") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val fps = Multimodal.dhash(Multimodal.withPngPayload(docs))
      .cache()
    // the full-pair-graph form the DuckDB twin still computes
    val pairs = Multimodal.dhashPairs(fps, maxDist = 10).select("id_a", "id_b")
    val full = Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullAll = fps.select("doc_id").collect().map(_.getLong(0))
      .map(id => id -> full.getOrElse(id, id)).toMap
    // the collapsed (distinct-fingerprint-node) form
    val fast = Multimodal.dhashClusters(fps, maxDist = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == fullAll,
      s"collapse changed cluster keys: ${fast.toSet.diff(fullAll.toSet).take(5)}")
    assert(fast.nonEmpty && fast.exists { case (id, c) => id != c },
      "fixture should contain at least one nontrivial cluster")
    fps.unpersist()
    ()
  }

  test("dhashAnchorClusters: verified-CC partition refines the anchor partition " +
      "(coarser-or-equal — the leakage-safe direction)") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val fps = Multimodal.dhash(Multimodal.withPngPayload(docs)).cache()
    val verified = Multimodal.dhashClusters(fps, maxDist = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val linear = Multimodal.dhashAnchorClusters(fps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(linear.keySet == verified.keySet)
    // refinement: two docs in one VERIFIED cluster are always in one
    // anchor cluster (a verified pair can never straddle the split)
    val anchorOfVerified = scala.collection.mutable.Map[Long, Long]()
    verified.foreach { case (id, vc) =>
      anchorOfVerified.get(vc) match {
        case Some(lc) => assert(lc == linear(id),
          s"verified cluster $vc split across anchor clusters $lc / ${linear(id)}")
        case None => anchorOfVerified(vc) = linear(id)
      }
    }
    // coarser-or-equal, and the fixture must exercise real coarsening
    // machinery (some nontrivial cluster exists)
    val nVerified = verified.values.toSet.size
    val nLinear = linear.values.toSet.size
    assert(nLinear <= nVerified, s"$nLinear anchor vs $nVerified verified")
    assert(linear.exists { case (id, c) => id != c })
    // every cluster label is a member doc's id (min-id labeling)
    assert(linear.values.toSet.subsetOf(linear.keySet))
    fps.unpersist()
    ()
  }

  test("dhashBits matches a hand-rolled gradient fold on the downsampled grid") {
    val seed = "perceptual fingerprint fodder".getBytes("UTF-8")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.pngBytes(seed, 9, 6)))
    val grid = Multimodal.nearestNeighbor(img, 8, 8)
    def lum(x: Int, y: Int): Int = {
      val rgb = grid.getRGB(x, y)
      299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
    }
    var want = 0L
    for (y <- 0 until 8; x <- 0 until 7)
      if (lum(x + 1, y) > lum(x, y)) want |= 1L << (y * 7 + x)
    assert(Multimodal.dhashBits(img, 7, 8) == want)
    assert(want != 0L && want != (1L << 56) - 1, "fixture must be non-degenerate")
  }

  test("dhash: re-encode at distance 0, NN-upscale nearby, different image far") {
    def bits(seed: String, w: Int, h: Int): Long = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.pngBytes(seed.getBytes("UTF-8"), w, h)))
      Multimodal.dhashBits(img, 7, 8)
    }
    def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = bits("some recurring web boilerplate paragraph", 8, 8)
    // byte-identical pixels re-encoded -> identical fingerprint
    assert(dist(base, bits("some recurring web boilerplate paragraph", 8, 8)) == 0)
    // 2x NN upscale preserves the sample grid -> small distance
    val up = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.pngBytes("some recurring web boilerplate paragraph".getBytes("UTF-8"), 8, 8)))
      Multimodal.dhashBits(
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
          Multimodal.encodePng(Multimodal.nearestNeighbor(img, 16, 16)))), 7, 8)
    }
    assert(dist(base, up) <= 6, s"upscale moved ${dist(base, up)} bits")
    // unrelated content -> far
    assert(dist(base, bits("zq", 12, 9)) > 10)
  }

  test("dhashWide: hand-rolled 16x8 fold; pairs recall == brute force below band count") {
    import spark.implicits._
    val seed = "wide fingerprint fodder text".getBytes("UTF-8")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.pngBytes(seed, 11, 7)))
    val grid = Multimodal.nearestNeighbor(img, 16, 8)
    def lum(x: Int, y: Int): Int = {
      val rgb = grid.getRGB(x, y)
      299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
    }
    var lo = 0L; var hi = 0L
    for (y <- 0 until 8; x <- 0 until 15)
      if (lum(x + 1, y) > lum(x, y)) {
        if (y < 4) lo |= 1L << (y * 15 + x) else hi |= 1L << ((y - 4) * 15 + x)
      }
    assert(Multimodal.dhashWideBits(img) == ((lo, hi)))
    assert(lo != 0L && hi != 0L, "fixture must be non-degenerate")
    // pairs: same dims+text triples are identical images (ids 143 apart)
    val docs = (0L until 8L)
      .flatMap(k => Seq(k, k + 143L).map(id => (id, s"clip number $k content")))
      .toDF("doc_id", "text")
    val fps = Multimodal.dhashWide(Multimodal.withPngPayload(docs))
    val fpMap = fps.collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val got = Multimodal.dhashPairsWide(fps, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      a <- fpMap.keys; b <- fpMap.keys if a < b
      d = java.lang.Long.bitCount(fpMap(a)._1 ^ fpMap(b)._1) +
        java.lang.Long.bitCount(fpMap(a)._2 ^ fpMap(b)._2) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == want) // maxDist 3 < 4 bands: full recall guaranteed
    assert(want.nonEmpty, "fixture must contain duplicate images")
  }

  test("dhashDedupWide: survivors == brute-force anchor semantics; exact dups collapse") {
    import spark.implicits._
    val docs = (0L until 8L)
      .flatMap(k => Seq(k, k + 143L).map(id => (id, s"clip number $k content")))
      .toDF("doc_id", "text")
    val fps = Multimodal.dhashWide(Multimodal.withPngPayload(docs))
    val fpMap = fps.collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val maxDist = 3
    // brute-force the two-stage rule from the fingerprints alone:
    // (1) identical fps collapse to their eldest; (2) bucket-anchor drop
    val mask = (1L << 30) - 1L
    def bandsOf(fp: (Long, Long)): Seq[(Int, Long)] = Seq(
      (0, fp._1 & mask), (1, fp._1 >>> 30), (2, fp._2 & mask), (3, fp._2 >>> 30))
    val repMap: Map[Long, (Long, Long)] = fpMap.groupBy(_._2)
      .map { case (fp, xs) => (xs.keys.min, fp) }
    val anchor: Map[(Int, Long), Long] = repMap.toSeq
      .flatMap { case (id, fp) => bandsOf(fp).map(bv => (bv, id)) }
      .groupBy(_._1).map { case (bv, xs) => (bv, xs.map(_._2).min) }
    def dist(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val wantKept = repMap.keySet.filter { id =>
      !bandsOf(repMap(id)).exists { bv =>
        val a = anchor(bv)
        a < id && dist(repMap(a), repMap(id)) <= maxDist
      }
    }
    val got = Multimodal.dhashDedupWide(fps, maxDist = maxDist)
      .collect().map(_.getLong(0)).toSet
    assert(got == wantKept)
    // each doc_id/doc_id+143 twin is pixel-identical → identical fp →
    // the exact-collapse stage guarantees the younger twin drops (the
    // property a bucket-anchor pass alone can't promise)
    assert(got.forall(_ < 8L))
    assert(got.contains(0L), "the global min id can never be dropped")
    assert(got.nonEmpty)
  }

  test("dhashPlan: corpus-adaptive bands follow w >= ceilLog2(n) + margin") {
    // 120-bit wide fingerprint (widths 1..60 dividing 120)
    assert(Multimodal.dhashPlan(500L, 120) == 6)      // needed 17 -> w=20
    assert(Multimodal.dhashPlan(5000L, 120) == 5)     // needed 21 -> w=24
    assert(Multimodal.dhashPlan(500000L, 120) == 4)   // needed 27 -> w=30:
    // exactly the 4x30 layout SCALE_NOTES finding 6 measured at a
    // constant ~1.2x candidate:answer ratio at n = 500k
    assert(Multimodal.dhashPlan(5000000L, 120) == 3)  // needed 31 -> w=40
    assert(Multimodal.dhashPlan(1L << 53, 120) == 2)  // beyond every width
    // 32-bit audio fingerprint (widths 1,2,4,8,16): the margin-8 rule
    // never leaves room below w=16, so it resolves to 2 bands at any n
    assert(Multimodal.dhashPlan(200L, 32) == 2)       // needed 16 -> w=16
    assert(Multimodal.dhashPlan(500L, 32) == 2)       // fallback: widest
    assert(Multimodal.dhashPlan(16L, 32) == 2)        // needed 12 -> w=16
    // ... which is why m_afp_dedup pins a minBands=4 recall floor:
    // the clamp wins over the noise bound at every n
    assert(Multimodal.dhashPlan(16L, 32, minBands = 4) == 4)
    assert(Multimodal.dhashPlan(500L, 32, minBands = 4) == 4)
    assert(Multimodal.dhashPlan(1L << 40, 32, minBands = 4) == 4)
    // ... and never LOWERS a rule choice that was already above it
    assert(Multimodal.dhashPlan(500L, 120, minBands = 4) == 6)
  }

  test("dhashPlanSqlCase evaluates identically to dhashPlan (oracle-twin lockstep)") {
    for (nBits <- Seq(120, 32, 56);
         minBands <- Seq(2, 4);
         n <- Seq(1L, 2L, 100L, 500L, 4096L, 4097L, 65536L, 65537L,
           500000L, 5000000L, 1L << 40, 1L << 53)) {
      val sql = Multimodal.dhashPlanSqlCase(nBits, 8, n.toString, minBands)
      val got = spark.sql(s"SELECT $sql AS b").head().get(0).toString.toInt
      assert(got == Multimodal.dhashPlan(n, nBits, minBands = minBands),
        s"nBits=$nBits n=$n minBands=$minBands")
    }
    // degenerate emitter inputs (every width <= margin) must yield a
    // bare constant matching the Scala fallback, not invalid SQL
    val bare = Multimodal.dhashPlanSqlCase(8, 8, "n")
    assert(!bare.contains("CASE") && bare == Multimodal.dhashPlan(5L, 8).toString)
  }

  test("dhashDedupWide with non-default bands == brute force (incl. straddling bands)") {
    import spark.implicits._
    val docs = (0L until 8L)
      .flatMap(k => Seq(k, k + 143L).map(id => (id, s"clip number $k content")))
      .toDF("doc_id", "text")
    val fps = Multimodal.dhashWide(Multimodal.withPngPayload(docs))
    val fpMap = fps.collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val maxDist = 3
    def dist(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    // bands=5 (w=24) and bands=3 (w=40) both include a band straddling
    // the fp_lo/fp_hi boundary at bit 60
    for (bands <- Seq(5, 3)) {
      val w = 120 / bands
      def bandsOf(fp: (Long, Long)): Seq[(Int, Long)] = {
        val full = (BigInt(fp._2) << 60) | BigInt(fp._1)
        (0 until bands).map(i =>
          (i, ((full >> (i * w)) & ((BigInt(1) << w) - 1)).toLong))
      }
      val repMap: Map[Long, (Long, Long)] = fpMap.groupBy(_._2)
        .map { case (fp, xs) => (xs.keys.min, fp) }
      val anchor: Map[(Int, Long), Long] = repMap.toSeq
        .flatMap { case (id, fp) => bandsOf(fp).map(bv => (bv, id)) }
        .groupBy(_._1).map { case (bv, xs) => (bv, xs.map(_._2).min) }
      val wantKept = repMap.keySet.filter { id =>
        !bandsOf(repMap(id)).exists { bv =>
          val a = anchor(bv)
          a < id && dist(repMap(a), repMap(id)) <= maxDist
        }
      }
      val got = Multimodal.dhashDedupWide(fps, maxDist = maxDist, bands = bands)
        .collect().map(_.getLong(0)).toSet
      assert(got == wantKept, s"bands=$bands")
    }
  }

  test("wideBands == BigInt bit extraction for EVERY divisor band count (random fps)") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xBAD5EED)
    val mask60 = (1L << 60) - 1L
    val fps = (0L until 64L).map(id =>
      (id, rnd.nextLong() & mask60, rnd.nextLong() & mask60))
    val df = fps.toDF("doc_id", "fp_lo", "fp_hi")
    for (bands <- Seq(2, 3, 4, 5, 6, 8, 10, 12, 15, 20, 24, 30, 40, 60)) {
      val w = 120 / bands
      val got = Multimodal.wideBands(df, bands)
        .select("doc_id", "b", "v")
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      fps.foreach { case (id, lo, hi) =>
        val full = (BigInt(hi) << 60) | BigInt(lo)
        (0 until bands).foreach { i =>
          val want = ((full >> (i * w)) & ((BigInt(1) << w) - 1)).toLong
          assert(got((id, i)) == want, s"bands=$bands id=$id band=$i")
        }
      }
    }
  }

  test("imageEntropy: flat image scores exactly 0; rich image matches the hand fold") {
    import spark.implicits._
    def png(im: java.awt.image.BufferedImage): Array[Byte] = Multimodal.encodePng(im)
    val flat = new java.awt.image.BufferedImage(6, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 6) flat.setRGB(x, y, 0x336699)
    val richBytes = Multimodal.pngBytes("entropy rich fixture text".getBytes("UTF-8"), 9, 8)
    val df = Seq((1L, png(flat)), (2L, richBytes)).toDF("doc_id", "payload")
    val got = Multimodal.imageEntropy(df)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((30L, 0.0)), "constant image must score exactly zero")
    // hand fold over the decoded rich image with the identical spelling
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(richBytes))
    val counts = new Array[Long](16)
    for (y <- 0 until 8; x <- 0 until 9) {
      val rgb = im.getRGB(x, y)
      val lum = 299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
      counts(lum * 16 / 255001) += 1
    }
    val s = counts.filter(_ > 1)
      .map(c => math.floor(c * math.log(c.toDouble) * 1048576.0) / 1048576.0).sum
    val want = math.floor((math.log(72.0) - s / 72.0) * 1048576.0) / 1048576.0
    assert(got(2L) == ((72L, want)))
    assert(want > 1.0, "rich fixture must not be degenerate")
  }

  test("fpAnchorDedup: exact dups collapse, near anchors drop, far fps survive") {
    import spark.implicits._
    val fps = Seq(
      (1L, 0xABCDL), (5L, 0xABCDL), // 5 is an exact dup → stage-1 collapse
      (7L, 0xABCDL ^ 0x3L), // 2 bits from 1, shares 3 bands → anchor drop
      (9L, 0x123456FFL)) // no shared band value with 1, far → kept
      .toDF("doc_id", "fp")
    val got = Multimodal.fpAnchorDedup(fps, nBits = 32, bands = 4, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0xABCDL), (9L, 0x123456FFL)))
  }

  test("energySegments: silence/speech runs merge; decode path feeds it end to end") {
    // hand energies: 4 silent, 3 loud, 2 silent → three segments
    val e = Array(1L, 0L, 2L, 1L, 100L, 90L, 100L, 0L, 3L)
    assert(Multimodal.energySegments(e) == Seq(
      (1L, false, 0L, 3L), (2L, true, 4L, 6L), (3L, false, 7L, 8L)))
    // all-equal energies: every frame voiced? 4e > emax with e = emax
    // → true for any e > 0 → ONE voiced segment; all-zero → one unvoiced
    assert(Multimodal.energySegments(Array(5L, 5L, 5L)) == Seq((1L, true, 0L, 2L)))
    assert(Multimodal.energySegments(Array(0L, 0L)) == Seq((1L, false, 0L, 1L)))
    // end-to-end: a REAL WAV with a silent first half decodes into a
    // 2-segment (unvoiced, voiced) split
    val samples = new Array[Byte](1600) // 800 samples little-endian
    var i = 400
    while (i < 800) { // loud square wave in the back half
      val v = if (i % 2 == 0) 12000 else -12000
      samples(2 * i) = (v & 0xff).toByte
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, 800)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val energies = Multimodal.audioFrameEnergies(bos.toByteArray, 32).get
    assert(Multimodal.energySegments(energies) == Seq(
      (1L, false, 0L, 15L), (2L, true, 16L, 31L)))
  }

  test("audioFpBits: decode-path energies match the generator formula bit fold") {
    def localFp(seed: Long, frames: Int): Long = {
      val freq = 200.0 + (math.abs(seed) % 200)
      val v = (0 until 800).map(i =>
        (math.sin(2 * math.Pi * freq * i / 8000) * 0.5 * 32767.0).toInt.toLong)
      val per = 800 / frames
      val e = v.grouped(per).map(_.map(x => x * x).sum).toArray
      (0 until frames - 1).foldLeft(0L)((fp, f) =>
        if (e(f + 1) > e(f)) fp | (1L << f) else fp)
    }
    for (seed <- Seq(0L, 7L, 199L, 200L, 451L)) {
      assert(Multimodal.audioFpBits(Multimodal.wavBytes(seed), 32)
        == Some(localFp(seed, 32)), s"seed $seed")
    }
    // seeds 200 apart share the frequency -> identical waveform and fp
    assert(Multimodal.audioFpBits(Multimodal.wavBytes(13L), 32)
      == Multimodal.audioFpBits(Multimodal.wavBytes(213L), 32))
  }

  test("dhashPairs == brute-force pairs when distance < band count") {
    import spark.implicits._
    // ids 143 apart share the (w, h) = (4 + id%13, 4 + id%11) grid, so
    // same-text triples are byte-identical images -> distance-0 pairs
    val docs = (0L until 10L)
      .flatMap(k => Seq(k, k + 143L, k + 286L).map(id => (id, s"document number $k body")))
      .toDF("doc_id", "text")
    val fps = Multimodal.dhash(Multimodal.withPngPayload(docs))
    val fpMap = fps.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = Multimodal.dhashPairs(fps, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      a <- fpMap.keys; b <- fpMap.keys if a < b
      d = java.lang.Long.bitCount(fpMap(a) ^ fpMap(b)) if d <= 3
    } yield (a, b, d.toLong)).toSet
    // maxDist 3 < 4 bands: banding provably recalls every such pair
    assert(got == want)
    assert(want.nonEmpty, "fixture must contain near-duplicate images")
  }
}
