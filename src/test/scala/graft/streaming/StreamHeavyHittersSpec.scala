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

  test("decayed: recency outranks history; values match independent decay math") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-dhh").toFile.getAbsolutePath
    val stream = MemoryStream[(String, Double, Long)]
    val q = StreamHeavyHitters
      .decayed(stream.toDF().toDF("k", "w", "t"), halfLifeSec = 10.0,
        capacity = 32, buckets = 1)
      .writeStream
      .format("memory").queryName("dhh_out")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      // t=0: "old" gets 100 weight; t=100: "new" gets 10 — at as_of
      // 100, old has decayed to 100·2^-10 ≈ 0.098, so new leads
      stream.addData(Seq.fill(100)(("old", 1.0, 0L)): _*)
      q.processAllAvailable()
      stream.addData(Seq.fill(10)(("new", 1.0, 100L)): _*)
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT key, count_lo, err, as_of FROM dhh_out
          |WHERE as_of = 100 ORDER BY count_lo DESC""".stripMargin)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      assert(rows.map(_._1).toSeq == Seq("new", "old"))
      assert(rows.forall(_._3 == 0.0), "capacity 32 must stay exact")
      val byKey = rows.map(r => r._1 -> r._2).toMap
      assert(math.abs(byKey("new") - 10.0) < 1e-9)
      assert(math.abs(byKey("old") - 100.0 * math.pow(2.0, -10.0)) < 1e-9)
    } finally q.stop()
  }

  test("decayed: renormalization across a >512-half-life gap is exact") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-dhh2").toFile.getAbsolutePath
    val stream = MemoryStream[(String, Double, Long)]
    val q = StreamHeavyHitters
      .decayed(stream.toDF().toDF("k", "w", "t"), halfLifeSec = 1.0,
        capacity = 8, buckets = 1)
      .writeStream
      .format("memory").queryName("dhh_renorm")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      stream.addData(("a", 4.0, 0L), ("b", 2.0, 0L))
      q.processAllAvailable()
      // 600 half-lives later: forces the landmark advance (ceiling 512)
      stream.addData(("c", 1.0, 600L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT key, count_lo FROM dhh_renorm WHERE as_of = 600")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      // direct decay math, no forward domain: a = 4·2^-600, b = 2·2^-600
      assert(rows("c") == 1.0)
      assert(rows("a") == 4.0 * math.pow(2.0, -600.0),
        s"renormalized value must equal direct decay exactly, got ${rows("a")}")
      assert(rows("b") == 2.0 * math.pow(2.0, -600.0))
    } finally q.stop()
  }

  test("comparable rescales cross-shard rows to one instant before ranking") {
    val rows = Seq(
      StreamHeavyHitters.DecayedTop(0, "y", 50.0, 0.0, 1000L),
      StreamHeavyHitters.DecayedTop(1, "x", 100.0, 2.0, 0L))
    // raw rows would rank x (100) over y (50) — but x's as_of is 1000s
    // older: at the common instant x is 100·2^-100
    val c = StreamHeavyHitters.comparable(rows, halfLifeSec = 10.0)
      .sortBy(-_.count_lo)
    assert(c.map(_.key) == Seq("y", "x"))
    assert(c.head.count_lo == 50.0)
    assert(c(1).count_lo == 100.0 * math.pow(2.0, -100.0))
    assert(c(1).err == 2.0 * math.pow(2.0, -100.0))
    assert(c.forall(_.as_of == 1000L))
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
