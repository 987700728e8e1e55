package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.llm.Sampling

/** Streaming bottom-k sampling ≡ batch bottom-k of the union. */
class StreamSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("hash01Local == the in-plan md5-uniform, value for value") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 42L, 999999937L)
    val plan = ids.toDF("id")
      .select(col("id"), Sampling.hash01(col("id"), "resv").as("u"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    ids.foreach { id =>
      assert(plan(id) == Sampling.hash01Local(id.toString, "resv"),
        s"id $id: local and Column md5-uniform must agree exactly")
    }
  }

  test("sampleBottomK == brute force on randomized strata/ids/duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(271828)
    for (trial <- 1 to 3) {
      val n = 300 + rnd.nextInt(300)
      val rows = Seq.fill(n)(
        ("s" + rnd.nextInt(5), rnd.nextInt(120).toLong)) // dup ids likely
      val k = 1 + rnd.nextInt(8)
      val got = Sampling.sampleBottomK(
          rows.toDF("stratum", "id"), col("stratum"), col("id"), k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      // brute force: per stratum, k smallest (u, id) over DISTINCT ids
      val expected = rows.distinct.groupBy(_._1).toSeq.flatMap { case (s, rs) =>
        rs.map(_._2).distinct
          .map(id => (Sampling.hash01Local(id.toString, "resv"), id))
          .sorted.take(k).zipWithIndex
          .map { case ((u, id), i) => (s, i + 1L, id, u) }
      }.sortBy(r => (r._1, r._2))
      assert(got.sortBy(r => (r._1, r._2)).toSeq == expected,
        s"trial $trial (k=$k) diverged from brute force")
    }
  }

  test("stream sample after N batches == batch sampleBottomK of the union") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-bk").toFile.getAbsolutePath
    val b1 = (1L to 40L).map(i => (if (i % 3 == 0) "fr" else "en", i))
    val b2 = (41L to 90L).map(i => (if (i % 3 == 0) "fr" else "en", i)) ++
      Seq(("en", 7L)) // re-delivered id must not duplicate
    val stream = MemoryStream[(String, Long)]
    val q = StreamSample.bottomK(stream.toDF().toDF("stratum", "id"), k = 5)
      .writeStream
      .format("memory").queryName("bk_out")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
      // every emission is a then-current sample, so the final sample
      // is the bottom-k of all emitted rows per stratum
      val emitted = spark.sql("SELECT stratum, id, u FROM bk_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .distinct
      val streamed = emitted.groupBy(_._1).map { case (s, rows) =>
        s -> rows.map(r => (r._3, r._2)).sorted.take(5).map(_._2).toSeq
      }
      // the union INCLUDES the re-delivered row: both sides must be
      // idempotent under duplicate ids for stream ≡ batch to hold
      val batch = Sampling.sampleBottomK(
          (b1 ++ b2).toDF("stratum", "id"), col("stratum"), col("id"), k = 5)
        .orderBy("stratum", "rank")
        .collect().map(r => (r.getString(0), r.getLong(2)))
        .groupBy(_._1).map { case (s, rows) => s -> rows.map(_._2).toSeq }
      assert(streamed == batch)
      assert(batch.values.forall(_.size == 5))
    } finally q.stop()
  }
}
