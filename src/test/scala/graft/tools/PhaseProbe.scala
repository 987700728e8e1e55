package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query planning-vs-execution breakdown under BENCH conditions
  * (local[$SPARK_GRAFT_CPUS], sf dir from $SPARK_GRAFT_SF_DIR, the
  * same Tuning shuffle ceiling Bench applies).
  *
  * For every registered query (or the comma-separated arg filter) it
  * runs the noop sink twice and prints one line per query:
  *
  *   PHASE | name | wall1_ms | wall2_ms | parse | analysis | optim |
  *   plan | jobs | stages | tasks |
  *
  * where parse/analysis/optim/plan come from the SECOND run's
  * `QueryExecution.tracker.phases` (steady-state planning cost; the
  * first run carries codegen/JIT warmup) and jobs/stages/tasks from a
  * SparkListener diff across the second run. The point: the bench's
  * ~0.6 s/query floor is a sum of driver planning, scheduling, and
  * executor compute — optimizing the wrong one wastes a round
  * (optimization guide §1: measure first).
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-phase-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tuning.configureShuffle(spark, Seq(sfDir), cpus.toInt)

    // same session warmups as Bench (memoized side tables + codecs)
    try {
      graft.engine.GraphiteTables.index(spark, sfDir).count()
      graft.engine.GraphiteTables.tags(spark, sfDir).count()
      graft.engine.GraphiteTables.points(spark, sfDir).count()
      graft.engine.GraphiteTables.pointsTagged(spark, sfDir).count()
    } catch { case _: Throwable => }
    try {
      val n = math.max(cpus.toInt, 1)
      spark.sparkContext.parallelize(0 until 4 * n, 4 * n)
        .foreach(_ => graft.llm.Multimodal.warmCodecs())
    } catch { case _: Throwable => }

    @volatile var jobs = 0L
    @volatile var stages = 0L
    @volatile var tasks = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })

    val only: Option[Set[String]] =
      args.headOption.map(_.split(',').toSet)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    for (name <- names) {
      try {
        def once(): (Double, Map[String, Long]) = {
          val t0 = System.nanoTime()
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          df.write.mode("overwrite").format("noop").save()
          val wall = (System.nanoTime() - t0) / 1e6
          val ph = df.queryExecution.tracker.phases.map { case (k, v) =>
            k -> (v.endTimeMs - v.startTimeMs)
          }
          (wall, ph)
        }
        val (w1, _) = once()
        val j0 = jobs; val s0 = stages; val t0 = tasks
        val (w2, ph) = once()
        val dj = jobs - j0; val ds = stages - s0; val dt = tasks - t0
        def g(k: String) = ph.getOrElse(k, 0L)
        println(f"PHASE | $name | ${w1}%.1f | ${w2}%.1f | ${g("parsing")} | " +
          s"${g("analysis")} | ${g("optimization")} | ${g("planning")} | $dj | $ds | $dt |")
      } catch {
        case e: Throwable =>
          println(s"PHASE-ERR $name ${Option(e.getMessage).getOrElse("?").take(120)}")
      }
    }
    spark.stop()
  }
}
