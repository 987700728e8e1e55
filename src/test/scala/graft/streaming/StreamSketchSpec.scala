package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.events.Sketches

/** Streaming sketch state after N micro-batches ≡ the batch sketch
  * of everything that arrived — the mergeability contract.
  */
class StreamSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def lastPerKey[K, V](rows: Seq[(K, V)]): Map[K, V] =
    rows.foldLeft(Map.empty[K, V]) { case (m, (k, v)) => m + (k -> v) }

  test("streaming CMS over two batches == batch cmsSketch of the union") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-cms").toFile.getAbsolutePath
    val b1 = (1 to 300).map(i => "u" + i % 37)
    val b2 = (1 to 200).map(i => "u" + i % 53)
    val stream = MemoryStream[String]
    val q = StreamSketch.cms(
        Sketches.cmsCells(stream.toDF().toDF("k"), col("k"), depth = 4, width = 16))
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // last emission per cell is the maintained sketch
    val got = lastPerKey(spark.table("cms_out")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toSeq)
    val want = Sketches.cmsSketch((b1 ++ b2).toDF("k"), col("k"), 4, 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == want)
  }

  test("streaming bloom == batch bloomBits; replay is a no-op (OR idempotent)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-bloom").toFile.getAbsolutePath
    val b1 = (1 to 80).map(i => "u" + i % 31)
    val b2 = (1 to 60).map(i => "u" + (i * 3) % 47)
    val stream = MemoryStream[String]
    val q = StreamSketch.bloom(
        Sketches.cmsCells(stream.toDF().toDF("k"), col("k"), depth = 4, width = 128)
          .select(col("bucket").as("pos")))
      .writeStream.format("memory").queryName("bloom_out")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    def posSet(): Set[Long] =
      spark.table("bloom_out").collect().map(_.getLong(0)).toSet
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      val want = Sketches.bloomBits((b1 ++ b2).toDF("k"), col("k"), 4, 128)
        .collect().map(_.getLong(0)).toSet
      assert(posSet() == want)
      stream.addData(b1: _*); q.processAllAvailable() // replay
      assert(posSet() == want, "re-delivered keys must not add bits")
    } finally q.stop()
  }

  test("streaming HLL == batch registers; replayed batch is a no-op (max idempotent)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-hll").toFile.getAbsolutePath
    val b1 = (1 to 250).map(i => ("g" + i % 2, "u" + i % 91))
    val b2 = (1 to 150).map(i => ("g" + i % 2, "u" + (i * 7) % 130))
    val stream = MemoryStream[(String, String)]
    val q = StreamSketch.hll(
        Sketches.hllObservations(
          stream.toDF().toDF("g0", "k"), col("g0"), col("k")))
      .writeStream.format("memory").queryName("hll_out")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    def state(): Map[(String, Long), Long] = lastPerKey(spark.table("hll_out")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toSeq)
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      val afterTwo = state()
      val want = Sketches.hllRegisters(
          (b1 ++ b2).toDF("g0", "k"), col("g0"), col("k"))
        .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
      assert(afterTwo == want)
      stream.addData(b2: _*); q.processAllAvailable() // replay
      assert(state() == want, "re-delivered HLL observations must not move registers")
    } finally q.stop()
  }
}
