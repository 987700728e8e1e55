package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming embedding admission: the admitted sign-code set stays
  * Hamming-near-duplicate-free across micro-batches, with the same
  * store-wins / in-batch keep-first policy as the text and media
  * admitters.
  */
class StreamVecAdmitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // a 16-dim unit-ish vector whose sign pattern is `bits`; `flip`
  // negates the listed dimensions (one crossed hyperplane each)
  private def vec(bits: Long, flip: Seq[Int] = Nil): Seq[Float] =
    (0 until 16).map { i =>
      val pos = ((bits >> i) & 1L) == 1L
      val sign = if (flip.contains(i)) !pos else pos
      if (sign) 0.5f else -0.5f
    }

  test("cross-batch rejects, in-batch keep-first, index equals codeBands(admitted)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-vadmit").toFile.getAbsolutePath
    val idxDir = s"$dir/index"
    def readIndex(): DataFrame =
      if (new java.io.File(idxDir).exists()) spark.read.parquet(idxDir)
      else Seq.empty[(Long, Int, Long, Long, Long)]
        .toDF("id", "b", "v", "code_lo", "code_hi")
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = stream.toDF().toDF("vec_id", "embedding")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(StreamVecAdmit.admitter(
        readIndex _, _.write.mode("append").parquet(idxDir), dim = 16))
      .start()
    def admittedIds(): Set[Long] =
      spark.read.parquet(idxDir).select("id").distinct().as[Long].collect().toSet
    val base = 0xA5C3L
    try {
      stream.addData(
        (1L, vec(base)),
        (2L, vec(base, flip = Seq(7))), // 1 bit away → loses to 1 in-batch
        (3L, vec(~base & 0xFFFFL))) // 16 bits away → admitted
      q.processAllAvailable()
      assert(admittedIds() == Set(1L, 3L))

      stream.addData(
        (10L, vec(base, flip = Seq(2, 11))), // 2 bits from stored 1 → rejected
        (11L, vec(base, flip = Seq(0, 1, 2, 3, 4, 5, 6, 7)))) // 8 bits → admitted
      q.processAllAvailable()
      assert(admittedIds() == Set(1L, 3L, 11L))

      val fps = graft.llm.Similarity.bqEncode(
          Seq((1L, vec(base)), (3L, vec(~base & 0xFFFFL)),
            (11L, vec(base, flip = Seq(0, 1, 2, 3, 4, 5, 6, 7))))
            .toDF("vec_id", "embedding"), dim = 16)
        .withColumnRenamed("vid", "id")
      val expect = StreamVecAdmit.codeBands(fps, dim = 16)
        .as[(Long, Int, Long, Long, Long)].collect().sorted.toSeq
      val got = spark.read.parquet(idxDir)
        .as[(Long, Int, Long, Long, Long)].collect().sorted.toSeq
      assert(got == expect, "persisted index must equal codeBands(admitted)")
    } finally q.stop()
  }

  test("admitCodes: near (not just exact) arrivals reject; pigeonhole covers d < 4") {
    import spark.implicits._
    val storeLo = 0x0F0F0F0FL
    val storeHi = 0x00FF00FFL
    val store = StreamVecAdmit.codeBands(
      Seq((100L, storeLo, storeHi)).toDF("id", "code_lo", "code_hi"))
    val arrivals = Seq(
      (1L, storeLo ^ 0x5L, storeHi), // 2 bits away → rejected
      (2L, storeLo ^ 0x3L, storeHi ^ 0x10000L), // 3 bits split across words/bands → rejected
      (3L, storeLo ^ 0xFFL, storeHi ^ 0xFFL) // 16 bits away → admitted
    ).toDF("id", "code_lo", "code_hi")
    val got = StreamVecAdmit.admitCodes(store, arrivals, maxDist = 3)
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L))
  }
}
