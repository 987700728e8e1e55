package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming Misra–Gries heavy hitters: bounded keyed state, bounds
  * that accumulate across micro-batches, cross-shard merge by plain
  * group-by.
  */
class StreamHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("counts accumulate across batches; exact regime matches plain counting") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-hh").toFile.getAbsolutePath
    val stream = MemoryStream[(String, Long)]
    val q = StreamHeavyHitters
      .heavyHitters(stream.toDF().toDF("k", "w"), capacity = 32, buckets = 4)
      .writeStream
      .format("memory").queryName("hh_out")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      stream.addData(("a", 2L), ("b", 1L), ("a", 3L))
      q.processAllAvailable()
      val b1 = spark.sql(
        "SELECT key, max(count_lo) FROM hh_out GROUP BY key")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(b1 == Map("a" -> 5L, "b" -> 1L))

      stream.addData(("a", 1L), ("c", 7L))
      q.processAllAvailable()
      // update mode re-emits a shard's entries each trigger: latest
      // value per key is the accumulated count
      val rows = spark.sql(
        """SELECT key, max(count_lo) AS lo FROM hh_out GROUP BY key""")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rows == Map("a" -> 6L, "b" -> 1L, "c" -> 7L))
      // exact regime: no shard ever decremented
      assert(spark.sql("SELECT max(err) FROM hh_out").collect()(0).getLong(0) == 0L)
    } finally q.stop()
  }

  test("state stays capacity-bounded under key churn; heavy key survives") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-hh2").toFile.getAbsolutePath
    val stream = MemoryStream[(String, Long)]
    val q = StreamHeavyHitters
      .heavyHitters(stream.toDF().toDF("k", "w"), capacity = 8, buckets = 1)
      .writeStream
      .format("memory").queryName("hh_churn")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      // batch 1: 60 distinct noise keys + a heavy one
      stream.addData(Seq.fill(30)(("hot", 1L)) ++ (0 until 60).map(i => ("n" + i, 1L)): _*)
      q.processAllAvailable()
      stream.addData(Seq.fill(30)(("hot", 1L)) ++ (60 until 120).map(i => ("n" + i, 1L)): _*)
      q.processAllAvailable()
      val out = spark.sql(
        """WITH latest AS (
          |  SELECT key, max(count_lo) AS lo, max(err) AS err FROM hh_churn GROUP BY key)
          |SELECT * FROM latest ORDER BY lo DESC""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(out.nonEmpty)
      // the single shard's state (and so each trigger's emission) is
      // capacity-bounded even though 121 distinct keys flowed through
      assert(out.map(_._3).max > 0L, "churn at capacity 8 must have decremented")
      val hot = out.find(_._1 == "hot")
      assert(hot.isDefined, "heavy key must survive churn")
      assert(hot.get._2 <= 60L && hot.get._2 + hot.get._3 >= 60L,
        s"bounds must cover the true count 60: $hot")
    } finally q.stop()
  }
}
