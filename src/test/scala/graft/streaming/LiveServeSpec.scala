package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.Instant
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.api.HttpApi
import graft.rollup.{AggFunc, Rules}

/** Live-ingest serving e2e (J3/S5 on one clock): a Structured
  * Streaming ingest commits micro-batches into the store WHILE the
  * same session's HttpApi serves `/render` from it — the reference's
  * carbon-clickhouse → clickhouse → graphite-clickhouse loop in one
  * JVM. The streaming query keeps running across both renders; the
  * test waits on the foreachBatch commit counter (not sleeps) so the
  * micro-batch boundary between the two assertions is deterministic.
  * The second batch carries a LATE point for an earlier, previously
  * empty bucket — the union of already-compacted and newly-committed
  * points must fill it exactly, which is the hot/cold read contract
  * (read-side version dedup + gap fill) the batch oracles pin.
  */
class LiveServeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val client = HttpClient.newHttpClient()
  private val rnow = 1704067200L // 10s-aligned so the grid is exact

  test("render mid-stream: exact grid before and after a micro-batch commit") {
    val root = Files.createTempDirectory("graft-live")
    val inDir = root.resolve("in"); Files.createDirectories(inDir)
    val tables = root.resolve("t").toString
    val committed = new AtomicLong(0)

    val stream = Ingest.parseLines(
        spark.readStream.format("text").load(inDir.toString)
          .toDF("value"))
      .writeStream
      .option("checkpointLocation", root.resolve("ck").toString)
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        if (n > 0) { Ingest.processBatch(batch, tables); committed.addAndGet(n) }
        ()
      }
      .start()

    val rules = Rules(Nil, defaultPrecision = 10L, defaultFunction = Some(AggFunc.Avg))
    var srv: HttpApi = null
    try {
      def awaitCommitted(n: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (committed.get() < n && System.nanoTime() < deadline) Thread.sleep(50)
        assert(committed.get() >= n, s"ingest stalled at ${committed.get()}/$n")
      }

      // micro-batch 1: two points
      Files.write(inDir.resolve("b1.txt"),
        s"live.m1 1.0 ${rnow - 20}\nlive.m1 2.0 ${rnow - 10}\n".getBytes,
        StandardOpenOption.CREATE)
      awaitCommitted(2)

      srv = new HttpApi(spark, tables, HttpApi.Config(rules = rules),
        clock = () => Instant.ofEpochSecond(rnow + 5)).start()
      def grid(): (Long, Long, Vector[Option[Double]]) = {
        val r = client.send(
          HttpRequest.newBuilder(URI.create(srv.address +
            s"/render/?target=live.m1&from=${rnow - 40}&until=$rnow&format=json"))
            .GET().build(),
          HttpResponse.BodyHandlers.ofByteArray())
        assert(r.statusCode() == 200, new String(r.body()).take(200))
        val body = new String(r.body())
        val m = """"startTime":(\d+).*?"stepTime":(\d+).*?"values":\[([^\]]*)\]""".r
        val hit = m.findFirstMatchIn(body).getOrElse(
          fail(s"no series in ${body.take(300)}"))
        val vs = hit.group(3).split(",").toVector.map {
          case "null" => None
          case s => Some(s.toDouble)
        }
        (hit.group(1).toLong, hit.group(2).toLong, vs)
      }

      val (start1, step1, v1) = grid()
      assert(step1 == 10L)
      def at(start: Long, vs: Vector[Option[Double]], t: Long): Option[Double] = {
        val i = ((t - start) / 10L).toInt
        if (i < 0 || i >= vs.length) None else vs(i)
      }
      assert(at(start1, v1, rnow - 20).contains(1.0))
      assert(at(start1, v1, rnow - 10).contains(2.0))
      assert(at(start1, v1, rnow - 30).isEmpty, "bucket must be a gap before batch 2")

      // micro-batch 2 commits WHILE the server is live: one new point
      // and one LATE point landing in the previously-empty bucket
      Files.write(inDir.resolve("b2.txt"),
        s"live.m1 9.0 $rnow\nlive.m1 4.0 ${rnow - 25}\n".getBytes,
        StandardOpenOption.CREATE)
      awaitCommitted(4)

      val (start2, _, v2) = grid()
      assert(at(start2, v2, rnow - 20).contains(1.0))
      assert(at(start2, v2, rnow - 10).contains(2.0))
      assert(at(start2, v2, rnow - 30).contains(4.0), "late point fills its bucket")
      assert(at(start2, v2, rnow).contains(9.0))
    } finally {
      stream.stop()
      if (srv != null) srv.stop()
    }
  }
}
