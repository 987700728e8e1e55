package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** REAL video codec: MJPEG-in-AVI written and parsed in pure JDK.
  * The container round trip is byte-faithful (RIFF walk recovers
  * exactly the JPEG chunks written, including odd-length padding),
  * sampling skips frames without decoding them, and decoded gradient
  * pixels land within a tight JPEG error bound.
  */
class VideoCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("aviBytes → aviFrames container round trip is byte-exact per frame") {
    val seed = "container bytes".getBytes("UTF-8")
    val frames = (0 until 5).map(f => Multimodal.jpegFrame(seed, 9, 7, f))
    // JPEG sizes are frequently odd → exercises RIFF even-padding both ways
    val avi = Multimodal.aviBytes(frames, 9, 7)
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val got = Multimodal.aviFrames(avi)
    assert(got.map(_._1) == (0 until 5))
    got.zip(frames).foreach { case ((_, g), e) =>
      assert(java.util.Arrays.equals(g, e))
    }
  }

  test("header carries dims + frame count where a standard reader expects them") {
    val avi = Multimodal.aviBytes(
      (0 until 3).map(f => Multimodal.jpegFrame(Array[Byte](1, 2, 3), 12, 10, f)), 12, 10)
    def u32(off: Int): Long =
      (avi(off) & 0xffL) | ((avi(off + 1) & 0xffL) << 8) |
        ((avi(off + 2) & 0xffL) << 16) | ((avi(off + 3) & 0xffL) << 24)
    // RIFF size covers the whole file minus the 8-byte header
    assert(u32(4) == avi.length - 8)
    // avih chunk starts at offset 24 (RIFF12 + LIST-hdrl12): dwTotalFrames
    // at +16, dwWidth/dwHeight at +32/+36 inside the 56-byte header
    assert(new String(avi.slice(24, 28), "US-ASCII") == "avih")
    val avihOff = 32
    assert(u32(avihOff + 16) == 3L)
    assert(u32(avihOff + 32) == 12L && u32(avihOff + 36) == 10L)
  }

  test("decoded gradient pixels stay within a tight JPEG error bound") {
    val seed = "gradient seed".getBytes("UTF-8")
    val w = 16; val h = 12; val frameNo = 1
    val jpeg = Multimodal.jpegFrame(seed, w, h, frameNo)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(img.getWidth == w && img.getHeight == h)
    val base = (seed(frameNo % seed.length) & 0xff) >> 1
    var err = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val expR = base + (x * 127) / (w - 1)
      val expG = base + (y * 127) / (h - 1)
      val rgb = img.getRGB(x, y)
      err += math.abs(((rgb >> 16) & 0xff) - expR) + math.abs(((rgb >> 8) & 0xff) - expG)
    }
    val meanErr = err / (w * h * 2)
    assert(meanErr < 16.0, s"mean abs channel error $meanErr")
  }

  test("sampleVideoFrames keeps every 2nd frame with decoded dims") {
    import spark.implicits._
    // ids chosen to cover nFrames ∈ {2,3,4,5}
    val docs = Seq((0L, "aa"), (1L, "bb"), (2L, "cc"), (3L, "dd"))
      .toDF("doc_id", "text")
    val out = Multimodal.sampleVideoFrames(Multimodal.withAviPayload(docs), everyK = 2)
      .orderBy("doc_id", "frame_no").collect()
    val expect = for {
      id <- 0L until 4L
      f <- 0 until (2 + id % 4).toInt if f % 2 == 0
    } yield (id, f, (8 + id % 5).toInt, (6 + id % 4).toInt)
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
      == expect)
  }

  test("videoMotion: constant-frame video has ~zero motion, varying video doesn't") {
    import spark.implicits._
    // doc 8: nFrames=2, seed chars equal → identical frames → motion ≈ 0
    // (frameNo also shifts blue, so allow the JPEG-quantized blue step)
    val docs = Seq((8L, "aaaa"), (9L, "a z X w")).toDF("doc_id", "text")
    val out = Multimodal.videoMotion(Multimodal.withAviPayload(docs))
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 2L)
    assert(out(0).getDouble(3) < 0.05)
    assert(out(1).getLong(1) == 3L)
    assert(out(1).getDouble(3) > out(0).getDouble(3))
  }

  test("videoMotionBanded: decoded lum/motion within the band of the analytic twin") {
    import spark.implicits._
    // ids cover nFrames ∈ {2..5} and all (w, h) residues; texts cover
    // empty, repeated-byte (near-tie frames) and multi-byte seeds
    val docs = Seq((0L, ""), (1L, "aaaa"), (2L, "a z X w"), (3L, "mixed Text 123"))
      .toDF("doc_id", "text")
    val out = Multimodal.videoMotionBanded(docs).collect()
    // one row per (doc, frame) — nothing dropped by the codec chain
    assert(out.length == (0L until 4L).map(id => (2 + id % 4).toInt).sum)
    // every decoded frame within tol of its analytic gradient; the
    // per-doc motion error band likewise 0
    assert(out.forall(_.getLong(3) == 0L), "lum_err_band")
    assert(out.forall(_.getLong(4) == 0L), "motion_err_band")
    // the banded VALUE column is the analytic arithmetic: spot-check
    // doc 0 frame 0 by hand (empty seed → base 0; w=8, h=6)
    val sx = (0 until 8).map(x => (x * 127) / 7).sum
    val sy = (0 until 6).map(y => (y * 127) / 5).sum
    val lum0 = (0.299 * (0 + sx.toDouble / 8) + 0.587 * (0 + sy.toDouble / 6) +
      0.114 * 0) / 255.0
    val r0 = out.find(r => r.getLong(0) == 0L && r.getLong(1) == 0L).get
    assert(r0.getLong(2) == math.floor(lum0 * 64).toLong)
  }

  test("videoDhash + videoNearDups: identical clips pair at distance 0, unrelated don't") {
    import spark.implicits._
    // hand-built MJPEG clips with TEXTURED frames (the generator's
    // gradient frames are monotone in x, which saturates a horizontal
    // gradient hash — fine for the codec tests, useless for dedup)
    def jpegOf(seed: String, w: Int, h: Int): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.pngBytes(seed.getBytes("UTF-8"), w, h)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def clip(seedPrefix: String): Array[Byte] =
      Multimodal.aviBytes(
        (0 until 4).map(f => jpegOf(s"$seedPrefix frame $f", 12, 10)), 12, 10)
    val docs = Seq(
      (1L, clip("wildlife")), (2L, clip("wildlife")), (3L, clip("unrelated noise")))
      .toDF("doc_id", "payload")
    val fps = Multimodal.videoDhash(docs, everyK = 1)
    assert(fps.where(col("doc_id") === 1L).count() == 4)
    val pairs = Multimodal.videoNearDups(fps, maxDist = 8, minFrac = 0.6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // byte-identical clips decode identically -> all 4 aligned frames
    // at distance 0; the unrelated clip pairs with neither
    assert(pairs.keySet == Set((1L, 2L)))
    assert(pairs((1L, 2L)) == 4L)
  }

  test("malformed payloads yield no frames, not a crash") {
    assert(Multimodal.aviFrames(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.aviFrames("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    // truncated mid-movi: a frame-size field pointing past the buffer
    val avi = Multimodal.aviBytes(
      Seq(Multimodal.jpegFrame(Array[Byte](5), 8, 6, 0)), 8, 6)
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length / 2)
    assert(Multimodal.aviFrames(cut).isEmpty)
  }

  test("high-bit chunk sizes terminate the RIFF walk instead of looping") {
    // Size fields are unsigned 32-bit; 0xFFFFFFFF read as a signed Int
    // is -1, which used to walk the chunk pointer BACKWARDS forever.
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val body = "JUNK".getBytes("US-ASCII") ++ le32(0xffffffffL) ++
      Array.fill[Byte](16)(0)
    val top = "RIFF".getBytes("US-ASCII") ++ le32(4L + body.length) ++
      "AVI ".getBytes("US-ASCII") ++ body
    assert(Multimodal.aviFrames(top).isEmpty) // terminates, skips
    // same poison inside a LIST movi frame-size field
    val inner = "movi".getBytes("US-ASCII") ++
      "00dc".getBytes("US-ASCII") ++ le32(0x80000000L) ++
      Array.fill[Byte](8)(0)
    val lst = "LIST".getBytes("US-ASCII") ++ le32(inner.length.toLong) ++ inner
    val top2 = "RIFF".getBytes("US-ASCII") ++ le32(4L + lst.length) ++
      "AVI ".getBytes("US-ASCII") ++ lst
    assert(Multimodal.aviFrames(top2).isEmpty)
  }

  test("registered m_avi queries run on testdata with full coverage") {
    val sfDir = "/root/testdata/sf0.001"
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val motion = graft.SparkEntry.queries("m_avi_motion")(spark, sfDir)
    assert(motion.count() == nDocs) // every container decoded — none dropped
    val frames = graft.SparkEntry.queries("m_avi_frames")(spark, sfDir)
      .groupBy("doc_id").agg(count(lit(1)).as("n")).agg(min("n"), max("n"))
      .collect().head
    // everyK=2 over 2..5 frames → 1..3 sampled per doc
    assert(frames.getLong(0) >= 1L && frames.getLong(1) <= 3L)
  }
}
