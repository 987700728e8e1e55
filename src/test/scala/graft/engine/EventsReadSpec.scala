package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The testdata generator has shipped `events.ts` both as raw Long
  * nanoseconds and as microsecond timestamps (TIMESTAMP_NTZ on read).
  * `GraphiteTables.events` must normalize either file to the
  * Long-nanos contract every downstream query divides by 1e9 —
  * a silent type flip here broke every `ev_*`/`st_*` query once.
  */
class EventsReadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val tsNanos = 1704067200L * 1000000000L + 123456000L

  private def readBack(writeTs: org.apache.spark.sql.DataFrame): Long = {
    val dir = Files.createTempDirectory("graft-events").toFile
    dir.deleteOnExit()
    val sub = s"${dir.getAbsolutePath}/d"
    writeTs.write.parquet(s"$sub/events.parquet")
    val out = GraphiteTables.events(spark, sub)
    assert(out.schema("ts").dataType == LongType, "ts must read as Long nanos")
    out.select(col("ts")).collect().head.getLong(0)
  }

  test("long-nanos ts passes through unchanged") {
    import spark.implicits._
    val got = readBack(Seq((1L, tsNanos)).toDF("event_id", "ts"))
    assert(got == tsNanos)
  }

  test("microsecond-timestamp ts is normalized to the same nanos") {
    import spark.implicits._
    // TIMESTAMP_NTZ column carrying the same instant at µs precision
    val df = Seq(Tuple1(1L)).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(tsNanos / 1000L)).cast("timestamp_ntz"))
    val got = readBack(df)
    assert(got == tsNanos)
  }
}
