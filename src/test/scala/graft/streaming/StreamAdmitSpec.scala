package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming near-dup admission: the store accumulated across
  * micro-batches stays near-duplicate-free, and full-history rejects
  * work across batch boundaries (unlike the horizon-bounded
  * [[StreamNearDup]]).
  */
class StreamAdmitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("admitter: cross-batch store rejects, in-batch keep-first, store grows clean") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-admit").toFile.getAbsolutePath
    val storeDir = s"$dir/store"
    def readStore(): DataFrame =
      if (new java.io.File(storeDir).exists())
        spark.read.parquet(storeDir)
      else Seq.empty[(Long, String)].toDF("doc_id", "text")
    def appendStore(df: DataFrame): Unit =
      df.write.mode("append").parquet(storeDir)

    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(StreamAdmit.admitter(
        col("text"), col("doc_id"), readStore _, appendStore))
      .start()
    try {
      stream.addData(
        (1L, "the quick brown fox jumps over dogs"),
        (2L, "the quick brown fox jumps over dogs"), // in-batch dup → loses to 1
        (3L, "completely other content entirely here folks"))
      q.processAllAvailable()
      assert(spark.read.parquet(storeDir).select("doc_id")
        .as[Long].collect().toSet == Set(1L, 3L))

      stream.addData(
        (10L, "the quick brown fox jumps over dogs"), // dup of batch-1's 1 → rejected
        (11L, "fresh new material nothing like before okay"))
      q.processAllAvailable()
      assert(spark.read.parquet(storeDir).select("doc_id")
        .as[Long].collect().toSet == Set(1L, 3L, 11L))
    } finally q.stop()
  }
}
