package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.llm.Multimodal

/** Streaming media curation: corrupt payloads gated, features
  * emitted, and dedup keyed on DECODED pixels — a re-encode of the
  * same image (PNG vs BMP, identical pixel grid, different bytes) is
  * caught where byte-hash dedup would miss it.
  */
class StreamMediaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def bmpBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  test("pixelHash: equal pixels equal hash; dims and any pixel change it") {
    val a = Multimodal.pngBytes("seed one".getBytes("UTF-8"), 6, 5)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a))
    val again = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a))
    assert(StreamMedia.pixelHash(img) == StreamMedia.pixelHash(again))
    val other = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.pngBytes("seed two".getBytes("UTF-8"), 6, 5)))
    assert(StreamMedia.pixelHash(img) != StreamMedia.pixelHash(other))
    // same pixel bytes arranged 5x6 instead of 6x5 must differ (dims mixed in)
    val otherDims = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.pngBytes("seed one".getBytes("UTF-8"), 5, 6)))
    assert(StreamMedia.pixelHash(img) != StreamMedia.pixelHash(otherDims))
  }

  test("pipeline: corrupt gated; PNG→BMP re-encode deduped on decoded content") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val png = Multimodal.pngBytes("same asset".getBytes("UTF-8"), 7, 4)
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bmp = bmpBytes(decoded) // identical pixels, very different bytes
    assert(!java.util.Arrays.equals(png, bmp))
    val distinct = Multimodal.pngBytes("different asset".getBytes("UTF-8"), 7, 4)

    val stream = MemoryStream[(Long, Long, Array[Byte])]
    val input = stream.toDF().select(
      col("_1").as("doc_id"),
      timestamp_seconds(col("_2")).as("event_time"),
      col("_3").as("payload"))
    val out = StreamMedia.pipeline(input, lateness = "100 seconds", bins = 4)
    val name = s"media_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    stream.addData(Seq(
      (1L, 100L, png),
      (2L, 101L, Array[Byte](1, 2, 3)),  // corrupt → gated
      (3L, 102L, bmp),                   // re-encode of 1 → deduped
      (4L, 103L, distinct)))             // genuinely new → kept
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).collect()
    spark.catalog.dropTempView(name)
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 4L),
      rows.map(_.getLong(0)).mkString(","))
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getInt(2) == 7 && byId(1L).getInt(3) == 4)
    // features come from the decoded grid: match a local decode exactly
    val expect = Multimodal.imageFeatures(decoded, 4)
    byId(1L).getSeq[Double](5).zip(expect).foreach {
      case (g, e) => assert(math.abs(g - e) < 1e-12)
    }
  }

  test("late re-encode outside the horizon is the batch layer's job (state bounded)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val png = Multimodal.pngBytes("horizon".getBytes("UTF-8"), 5, 5)
    val bmp = bmpBytes(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png)))
    val stream = MemoryStream[(Long, Long, Array[Byte])]
    val input = stream.toDF().select(
      col("_1").as("doc_id"),
      timestamp_seconds(col("_2")).as("event_time"),
      col("_3").as("payload"))
    val out = StreamMedia.pipeline(input, lateness = "10 seconds")
    val name = s"media_h_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    stream.addData(Seq((1L, 100L, png)))
    q.processAllAvailable()
    // advance the watermark far past the horizon, then replay the asset
    stream.addData(Seq((2L, 1000L, Multimodal.pngBytes("mover".getBytes("UTF-8"), 5, 5))))
    q.processAllAvailable()
    stream.addData(Seq((3L, 1001L, bmp)))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table(name).collect().map(_.getLong(0)).toSet
    spark.catalog.dropTempView(name)
    // 3 passes: its twin's state expired with the watermark — the
    // designed bound (full-history dedup belongs to the batch layer)
    assert(ids == Set(1L, 2L, 3L))
  }
}
