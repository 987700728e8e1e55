package graft.events

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AnomalySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("a volume spike flags; steady types and zero-variance types never do") {
    import spark.implicits._
    // 'click': 10 hours of 2 events + one hour of 30 → that hour is
    // the lone outlier. 'steady': identical counts → sd = 0 → never
    // flags (no div-by-zero row leaks out).
    val click = (0 until 10).flatMap(h => Seq.fill(2)(("click", h * 3600L))) ++
      Seq.fill(30)(("click", 10 * 3600L))
    val steady = (0 until 10).map(h => ("steady", h * 3600L))
    val df = (click ++ steady).toDF("event_type", "t")
    val out = Anomaly.hourlyZscores(df, col("event_type"), col("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(("click", 36000L)))
    val (n, z) = out(("click", 36000L))
    assert(n == 30L && z > 2.0)
  }

  test("bursts: consecutive flagged hours fuse into one period, gaps split") {
    import spark.implicits._
    // baseline 2/hour over 20 hours, spikes of 40 at hours 5,6,7 and
    // hour 15 → exactly two bursts: [5..7] and [15..15]
    val base = (0 until 20).flatMap(h => Seq.fill(2)(("click", h * 3600L)))
    val spikes = Seq(5, 6, 7, 15).flatMap(h => Seq.fill(40)(("click", h * 3600L)))
    val df = (base ++ spikes).toDF("event_type", "t")
    val out = Anomaly.bursts(df, col("event_type"), col("t"), threshold = 1.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      ("click", 5 * 3600L, 7 * 3600L, 3L),
      ("click", 15 * 3600L, 15 * 3600L, 1L)))
  }

  test("type correlation: ±1 on linearly dependent hourly volumes, pairs ordered") {
    import spark.implicits._
    // over 3 hours: up = 1,2,3 events; down = 3,2,1; flat2 tracks up
    def burst(t: String, perHour: Seq[Int]) =
      perHour.zipWithIndex.flatMap { case (k, h) =>
        Seq.fill(k)((t, h * 3600L)) }
    val df = (burst("up", Seq(1, 2, 3)) ++ burst("down", Seq(3, 2, 1)) ++
      burst("tracks", Seq(2, 4, 6))).toDF("event_type", "t")
    val out = Anomaly.typeCorrelation(df, col("event_type"), col("t"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("down", "up")) == ((3L, -1.0)))
    assert(out(("tracks", "up")) == ((3L, 1.0)))
    assert(out(("down", "tracks")) == ((3L, -1.0)))
    assert(out.size == 3) // ta < tb only — no self or mirrored pairs
  }
}
