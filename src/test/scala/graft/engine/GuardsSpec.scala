package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.engine.Guards._

/** Storage-protection guards: band selection vectors mirror the
  * reference's `config_test.go` `TestGetQueryParam`; limits/timeout
  * behavior mirrors `helper/clickhouse/clickhouse.go:65-126`.
  */
class GuardsSpec extends AnyFunSuite {

  private val H = 3600L

  test("ReadLimits.fromUrl scrapes limit settings, ignores the rest") {
    val l = ReadLimits.fromUrl(
      "http://host:8123/?max_rows_to_read=1&max_result_bytes=1073741824&readonly=2&log_queries=1")
    assert(l == ReadLimits(maxRowsToRead = 1, maxResultBytes = 1073741824L))
    assert(ReadLimits.fromUrl("http://host:8123/") == ReadLimits())
    assert(ReadLimits.fromUrl("http://host:8123/?max_memory_usage=7")
      == ReadLimits(maxMemoryUsage = 7))
  }

  test("select: only default band — every duration lands on it (config_test.go 'Only default')") {
    val params = withDefault(QueryParam(0, dataTimeoutSec = 20), Nil)
    for (d <- Seq(-60L, 0L, 60L, 72 * H, 2160 * H))
      assert(select(params, d) == params(0), s"duration $d")
  }

  test("select: declared band takes over at its threshold (config_test.go 'two params')") {
    val band72h = QueryParam(72 * H, dataTimeoutSec = 40)
    val params = withDefault(QueryParam(0, dataTimeoutSec = 20), Seq(band72h))
    for (d <- Seq(-60L, 0L, 60L, 72 * H - 1))
      assert(select(params, d) == params(0), s"duration $d")
    for (d <- Seq(72 * H, 2160 * H))
      assert(select(params, d) == band72h, s"duration $d")
  }

  test("select: last band with threshold <= duration wins (error_handling conf shape)") {
    val band1h = QueryParam(H, dataTimeoutSec = 5, limits = ReadLimits(maxRowsToRead = 1))
    val band7h = QueryParam(7 * H, dataTimeoutSec = 5, limits = ReadLimits(maxMemoryUsage = 1))
    val params = withDefault(QueryParam(0, dataTimeoutSec = 1), Seq(band1h, band7h))
    assert(select(params, 11) == params(0))
    assert(select(params, 21600) == band1h) // 6 h window → 1 h band
    assert(select(params, 14200) == band1h)
    assert(select(params, 864000) == band7h) // 10 d window → 7 h band
  }

  test("withDefault rejects a declared band without a duration (config.go:606-609)") {
    assertThrows[IllegalArgumentException] {
      withDefault(QueryParam(0), Seq(QueryParam(0, dataTimeoutSec = 60)))
    }
  }

  test("checkReadLimits: rows and memory refusals carry the reference's wording") {
    val rows = intercept[StorageError] {
      checkReadLimits(ReadLimits(maxRowsToRead = 1), rows = 22, bytes = BigInt(0))
    }
    assert(rows.code == 403)
    assert(rows.message.startsWith("Storage read limit for rows"))

    val mem = intercept[StorageError] {
      checkReadLimits(ReadLimits(maxMemoryUsage = 1), rows = 0, bytes = BigInt(4096))
    }
    assert(mem.code == 403)
    assert(mem.message == "Storage read limit for memory")

    // unlimited band: the by-name estimates must never run
    checkReadLimits(ReadLimits(), rows = sys.error("rows estimated"), bytes = sys.error("bytes"))
    // within limits: no throw
    checkReadLimits(ReadLimits(maxRowsToRead = 100), rows = 22, bytes = BigInt(0))
  }

  test("withDeadline: fast body passes through, its errors propagate") {
    val spark = SparkTestBase.spark
    assert(withDeadline(spark, timeoutSec = 10)(41 + 1) == 42)
    val boom = intercept[IllegalStateException] {
      withDeadline(spark, timeoutSec = 10)(throw new IllegalStateException("boom"))
    }
    assert(boom.getMessage == "boom")
    // no deadline → same thread, no job-group machinery
    assert(withDeadline(spark, timeoutSec = 0)(7) == 7)
  }

  test("withDeadline: an overrunning storage read is cancelled and maps to 504") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // Under the full parallel suite a stray interrupt can land on a
    // reused local-executor pool thread and kill the sleeping task
    // before OUR deadline fires; with local mode's task.maxFailures=1
    // the body then fails with a SparkException inside the deadline
    // instead of overrunning it. That is an artifact of the shared
    // local thread pool, not the semantics under test — drop a stale
    // interrupt flag at task start and retry artifact runs.
    def attempt(): Either[Throwable, StorageError] =
      try {
        withDeadline(spark, timeoutSec = 1) {
          // a Spark action that cannot finish inside the deadline
          spark.range(0, 4, 1, 4).as[Long].mapPartitions { it =>
            Thread.interrupted() // clear a stale flag from a reused pool thread
            Thread.sleep(600000); it
          }.count()
        }
        Left(new AssertionError("deadline did not fire"))
      } catch {
        case e: StorageError                 => Right(e)
        case scala.util.control.NonFatal(e)  => Left(e)
      }
    val runs = scala.collection.mutable.Buffer.empty[Either[Throwable, StorageError]]
    while (runs.size < 3 && !runs.lastOption.exists(_.isRight)) runs += attempt()
    val err = runs.collectFirst { case Right(e) => e }
    assert(err.isDefined,
      s"no 504 in ${runs.size} attempts; failures: ${runs.collect { case Left(e) => e.toString }}")
    assert(err.get.code == 504)
    assert(err.get.message == "Storage read timeout")
    // the overrunning tasks are cancelled rather than left pinning the
    // test cores for 10 minutes — observable because this follow-up
    // job gets scheduled and completes
    assert(spark.range(10).count() == 10)
  }

  test("scanEstimate is driven by the pruned scan, not the full table") {
    val spark = SparkTestBase.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-guards").toFile.getAbsolutePath
    spark.range(1000).selectExpr("id", "id % 10 AS k").write.mode("overwrite").parquet(dir)
    val full = spark.read.parquet(dir)
    val (allRows, allBytes) = scanEstimate(full)
    val (someRows, _) = scanEstimate(full.where("k = 3"))
    assert(allRows == 1000 && someRows == 100)
    assert(allBytes > 0)
  }
}
