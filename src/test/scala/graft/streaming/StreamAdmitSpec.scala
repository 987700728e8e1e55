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

  test("admitterIndexed: same admissions, index stays in lockstep with the store") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-admit-idx").toFile.getAbsolutePath
    val storeDir = s"$dir/store"; val idxDir = s"$dir/index"
    def readStore(): DataFrame =
      if (new java.io.File(storeDir).exists()) spark.read.parquet(storeDir)
      else Seq.empty[(Long, String)].toDF("doc_id", "text")
    def readIndex(): DataFrame =
      if (new java.io.File(idxDir).exists()) spark.read.parquet(idxDir)
      else Seq.empty[(Long, String)].toDF("id", "band")
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(StreamAdmit.admitterIndexed(
        col("text"), col("doc_id"), readStore _,
        _.write.mode("append").parquet(storeDir),
        readIndex _,
        _.write.mode("append").parquet(idxDir)))
      .start()
    def indexMatchesStore(): Unit = {
      val expect = graft.llm.Dedup
        .bandIndex(spark.read.parquet(storeDir), col("text"), col("doc_id"))
        .as[(Long, String)].collect().sorted.toSeq
      val got = spark.read.parquet(idxDir).as[(Long, String)].collect().sorted.toSeq
      assert(got == expect, "persisted band index must equal bandIndex(store)")
    }
    try {
      stream.addData(
        (1L, "the quick brown fox jumps over dogs"),
        (2L, "the quick brown fox jumps over dogs"), // in-batch dup → loses to 1
        (3L, "completely other content entirely here folks"))
      q.processAllAvailable()
      assert(spark.read.parquet(storeDir).select("doc_id")
        .as[Long].collect().toSet == Set(1L, 3L))
      indexMatchesStore()

      stream.addData(
        (10L, "the quick brown fox jumps over dogs"), // dup of 1 via the INDEX
        (11L, "fresh new material nothing like before okay"))
      q.processAllAvailable()
      assert(spark.read.parquet(storeDir).select("doc_id")
        .as[Long].collect().toSet == Set(1L, 3L, 11L))
      indexMatchesStore()
    } finally q.stop()
  }

  test("checkpoint restart: pending batch replays against the SURVIVING index — " +
      "no re-admitted near-dup, no store rescan") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-admit-restart").toFile.getAbsolutePath
    val storeDir = s"$dir/store"; val idxDir = s"$dir/index"
    val acc = spark.sparkContext.longAccumulator("storeTextReadsRestart")
    def readStore(): DataFrame =
      if (new java.io.File(storeDir).exists())
        // typed-map barrier: every execution of the store-text relation
        // ticks once per row, so a full store rescan is observable
        spark.read.parquet(storeDir).as[(Long, String)]
          .mapPartitions(_.map { r => acc.add(1); r }).toDF("doc_id", "text")
      else Seq.empty[(Long, String)].toDF("doc_id", "text")
    def readIndex(): DataFrame =
      if (new java.io.File(idxDir).exists()) spark.read.parquet(idxDir)
      else Seq.empty[(Long, String)].toDF("id", "band")
    def body = StreamAdmit.admitterIndexed(
      col("text"), col("doc_id"), readStore _,
      _.write.mode("append").parquet(storeDir),
      readIndex _,
      _.write.mode("append").parquet(idxDir))

    val stream = MemoryStream[(Long, String)]
    def start() = stream.toDF().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(body)
      .start()

    val q1 = start()
    stream.addData(
      (1L, "the quick brown fox jumps over dogs"),
      (2L, "completely other content entirely here folks"))
    q1.processAllAvailable()
    assert(spark.read.parquet(storeDir).select("doc_id")
      .as[Long].collect().toSet == Set(1L, 2L))
    // data arrives, then the query dies BEFORE processing it — the
    // classic mid-stream kill with a pending offset range
    stream.addData(
      (10L, "the quick brown fox jumps over dogs"), // near-dup of stored 1
      (11L, "fresh new material nothing like before okay"))
    q1.stop()

    acc.reset()
    val q2 = start() // restart from the SAME checkpoint
    try {
      q2.processAllAvailable()
      // the pending batch replayed: the near-dup was rejected against
      // the store/index that survived the restart, the fresh doc landed
      assert(spark.read.parquet(storeDir).select("doc_id")
        .as[Long].collect().toSet == Set(1L, 2L, 11L))
      // the index was read back, not rebuilt: store text executed at
      // most once per admission (the verify fetch for the one matched
      // id), never a full signature rescan of all stored rows per batch
      assert(acc.value <= 2L,
        s"restart admission read store text ${acc.value} times (> matched rows)")
      // lockstep held across the restart
      val expect = graft.llm.Dedup
        .bandIndex(spark.read.parquet(storeDir), col("text"), col("doc_id"))
        .as[(Long, String)].collect().sorted.toSeq
      val got = spark.read.parquet(idxDir).as[(Long, String)].collect().sorted.toSeq
      assert(got == expect, "persisted band index must equal bandIndex(store) after restart")
      // post-restart arrivals keep admitting against the full history
      stream.addData(
        (20L, "fresh new material nothing like before okay"), // dup of 11
        (21L, "yet another wholly distinct document body"))
      q2.processAllAvailable()
      assert(spark.read.parquet(storeDir).select("doc_id")
        .as[Long].collect().toSet == Set(1L, 2L, 11L, 21L))
    } finally q2.stop()
  }

  test("idempotent admitter: batch replays overwrite their own partitions (exactly-once)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-admit-idem").toFile.getAbsolutePath
    val storeDir = s"$dir/store"; val idxDir = s"$dir/index"
    val body = StreamAdmit.admitterIndexedIdempotent(
      col("text"), col("doc_id"), storeDir, idxDir)
    def storeIds: Seq[Long] =
      spark.read.parquet(storeDir).select("doc_id").as[Long].collect().sorted.toSeq
    def indexRows: Seq[(Long, String)] = spark.read.parquet(idxDir)
      .select("id", "band").as[(Long, String)].collect().sorted.toSeq
    def indexInLockstep(): Unit = {
      val expect = graft.llm.Dedup.bandIndex(
          spark.read.parquet(storeDir).drop("batch_id"), col("text"), col("doc_id"))
        .as[(Long, String)].collect().sorted.toSeq
      assert(indexRows == expect)
    }

    val b0 = Seq(
      (1L, "the quick brown fox jumps over dogs"),
      (2L, "completely other content entirely here folks")).toDF("doc_id", "text")
    body(b0, 0L)
    assert(storeIds == Seq(1L, 2L))
    val b1 = Seq(
      (10L, "the quick brown fox jumps over dogs"), // near-dup of stored 1
      (11L, "fresh new material nothing like before okay")).toDF("doc_id", "text")
    body(b1, 1L)
    assert(storeIds == Seq(1L, 2L, 11L))
    indexInLockstep()
    val idxAfterB1 = indexRows

    // FULL replay (crash after both writes committed): no duplicates
    body(b1, 1L)
    assert(storeIds == Seq(1L, 2L, 11L))
    assert(indexRows == idxAfterB1)

    // PARTIAL-failure replay: crash BETWEEN the two writes — the store
    // has batch 1, the index does not. admitterIndexed's documented
    // caveat; here the replay heals it.
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmrf)); f.delete(): Unit
    }
    rmrf(new java.io.File(s"$idxDir/batch_id=1"))
    body(b1, 1L)
    assert(storeIds == Seq(1L, 2L, 11L))
    assert(indexRows == idxAfterB1)
    indexInLockstep()

    // post-replay batches keep admitting against the healed history
    val b2 = Seq(
      (20L, "fresh new material nothing like before okay"), // dup of 11
      (21L, "yet another wholly distinct document body")).toDF("doc_id", "text")
    body(b2, 2L)
    assert(storeIds == Seq(1L, 2L, 11L, 21L))
    indexInLockstep()
  }

  test("persisted-index admission never re-derives store signatures") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("storeTextReads")
    val storeRaw = Seq(
      (1L, "the quick brown fox jumps over dogs"),
      (2L, "completely other content entirely here folks"),
      (3L, "a third stored document with words inside")).toDF("doc_id", "text")
    // typed-map wrapper: an optimizer barrier, so EVERY execution of
    // the store-text relation pays one accumulator tick per store row
    val store = storeRaw.as[(Long, String)]
      .mapPartitions(_.map { r => acc.add(1); r }).toDF("doc_id", "text")
    // index computed offline (from the raw relation, collected) — the
    // persisted-table stand-in
    val idx = graft.llm.Dedup
      .bandIndex(storeRaw, col("text"), col("doc_id"))
      .as[(Long, String)].collect().toSeq.toDF("id", "band")
    val arrivals = Seq(
      (10L, "the quick brown fox jumps over dogs"), // store dup
      (11L, "fresh new material nothing like before okay")).toDF("doc_id", "text")

    acc.reset()
    val gotIndexed = graft.llm.Dedup.incrementalNearDups(
        store, idx, arrivals, col("text"), col("doc_id"), 3, 4, 2, 0.6)
      .select("doc_id").as[Long].collect().toSet
    val indexedReads = acc.value
    assert(gotIndexed == Set(11L))
    // store text executes AT MOST once per admission (the verify
    // fetch); the signature/band derivation never touches it
    assert(indexedReads <= 3L,
      s"indexed admission read store text $indexedReads times (> |store|)")

    acc.reset()
    val gotGeneric = graft.llm.Dedup.incrementalNearDups(
        store, arrivals, col("text"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(gotGeneric == gotIndexed) // same admissions either path
    // the generic form pays the extra store signature pass the
    // persisted index exists to eliminate
    assert(acc.value > indexedReads,
      s"generic=${acc.value} vs indexed=$indexedReads store-text reads")
  }
}
