package graft.prom

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-17 lag-window rewrite parity: every rewritten range function
  * (changes / resets / idelta / irate / delta / rate / increase and
  * the x-aliases) must produce EXACTLY the rows the collect_list →
  * sorted-fold aggregate produced, on a synthetic series engineered
  * to exercise counter resets, value plateaus (changes ties),
  * single-sample slots, and duplicate (path, time) writes at
  * different versions (the max-version-wins dedup upstream of the
  * window math). The kill switch (`graft.promql.lagwindow=false`)
  * selects the legacy path, so both forms run in one session on
  * identical input.
  */
class LagWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val fns = Seq(
    "changes(m[1h])", "resets(m[1h])", "idelta(m[1h])", "irate(m[1h])",
    "delta(m[1h])", "rate(m[1h])", "increase(m[1h])",
    "xrate(m[1h])", "xincrease(m[1h])")

  test("rewritten range fns match the legacy list-fold path row for row") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val start = 1700000000L
    // 6 series x irregular samples over 4h; values include resets
    // (drops to near zero), plateaus, and duplicate (path, time)
    // writes at different versions
    val rows = for {
      srs <- 0 until 6
      // distinct sample times per series, so the only duplicate
      // (path, time) pairs are the explicit higher-version rows below
      // (a random same-version duplicate with a different value would
      // make max_by's tie-break nondeterministic)
      t <- rnd.shuffle((0 until 4 * 3600 by 60).toList)
        .take(8 + rnd.nextInt(20)).map(start + _.toLong)
    } yield {
      val v = if (rnd.nextInt(5) == 0) rnd.nextInt(3).toDouble
              else (rnd.nextInt(100) + srs).toDouble
      (s"m?host=h$srs", t, v, rnd.nextInt(3).toLong)
    }
    val pts = (rows ++ rows.take(9).map { case (p, t, v, ver) =>
        (p, t, v + 1.0, ver + 3) // duplicate writes, higher version wins
      }).toDF("path", "time", "value", "version")
    val tagRows = graft.engine.GraphiteTables.expandTagRows(
      pts.select(col("path")).distinct()
        .withColumn("date", lit("1970-01-01").cast("date"))
        .withColumn("version", lit(0L)))

    for (q <- fns) {
      val expr = PromQL.parse(q)
        .fold(e => throw new IllegalArgumentException(e), identity)
      def run(lag: Boolean): Map[(String, Long), Double] = {
        s.conf.set(PromQL.LagWindowKey, lag.toString)
        try {
          val df = PromQL.evalMatrix(pts, tagRows, expr,
            start = start, end = start + 4 * 3600, step0 = 900L,
            lookbackSec = 3600L)
          df.collect()
            .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
        } finally s.conf.unset(PromQL.LagWindowKey)
      }
      val legacy = run(lag = false)
      val lagged = run(lag = true)
      assert(lagged.keySet == legacy.keySet, s"$q: row sets differ")
      for ((k, v) <- legacy) {
        val w = lagged(k)
        assert((v.isNaN && w.isNaN) ||
            math.abs(v - w) <= 1e-9 * math.max(1.0, math.abs(v)),
          s"$q at $k: legacy=$v lag=$w")
      }
    }
  }
}
