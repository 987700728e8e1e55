package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.llm.Multimodal

/** Streaming media admission: the admitted fingerprint set stays
  * perceptually-near-duplicate-free across micro-batches, rejects
  * work across batch boundaries, and the in-batch keep-first policy
  * matches the text admitter's.
  */
class StreamMediaAdmitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def png(seed: String, w: Int = 10, h: Int = 9): Array[Byte] =
    Multimodal.pngBytes(seed.getBytes("UTF-8"), w, h)

  test("cross-batch rejects, in-batch keep-first, admitted set stays clean") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-madmit").toFile.getAbsolutePath
    val idxDir = s"$dir/index"
    def readIndex(): DataFrame =
      if (new java.io.File(idxDir).exists()) spark.read.parquet(idxDir)
      else Seq.empty[(Long, Int, Long, Long)].toDF("id", "b", "v", "fp")
    val stream = MemoryStream[(Long, Array[Byte])]
    val q = stream.toDF().toDF("doc_id", "payload")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(StreamMediaAdmit.admitter(
        readIndex _, _.write.mode("append").parquet(idxDir)))
      .start()
    def admittedIds(): Set[Long] =
      spark.read.parquet(idxDir).select("id").distinct().as[Long].collect().toSet
    try {
      stream.addData(
        (1L, png("sunset over water")),
        (2L, png("sunset over water")), // in-batch exact dup → loses to 1
        (3L, png("dense forest canopy")))
      q.processAllAvailable()
      assert(admittedIds() == Set(1L, 3L))

      stream.addData(
        (10L, png("sunset over water")), // dup of batch-1's 1 → rejected
        (11L, png("city skyline at night")))
      q.processAllAvailable()
      assert(admittedIds() == Set(1L, 3L, 11L))

      // the index equals fpBands of the admitted fingerprints
      val fps = Multimodal.dhash(
          Seq((1L, png("sunset over water")), (3L, png("dense forest canopy")),
            (11L, png("city skyline at night"))).toDF("doc_id", "payload"))
        .withColumnRenamed("doc_id", "id")
      val expect = StreamMediaAdmit.fpBands(fps)
        .as[(Long, Int, Long, Long)].collect().sorted.toSeq
      val got = spark.read.parquet(idxDir)
        .as[(Long, Int, Long, Long)].collect().sorted.toSeq
      assert(got == expect, "persisted index must equal fpBands(admitted)")
    } finally q.stop()
  }

  test("admitFps: near (not just exact) arrivals reject against the store") {
    import spark.implicits._
    // store one fingerprint; probe with arrivals at controlled distances
    val storeFp = 0x00FF00FF00FFL
    val store = StreamMediaAdmit.fpBands(Seq((100L, storeFp)).toDF("id", "fp"))
    val arrivals = Seq(
      (1L, storeFp ^ 0x7L), // 3 bits away → rejected
      (2L, storeFp ^ ((1L << 40) - 1L)) // 40 bits away → admitted
    ).toDF("id", "fp")
    val got = StreamMediaAdmit.admitFps(store, arrivals, maxDist = 10)
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L))
  }
}
