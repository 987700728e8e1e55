package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stage duration/task breakdown for named queries under bench
  * conditions: `Test/runMain graft.tools.StageProbe q1,q2,...`.
  * Runs each query twice (noop) and prints the SECOND run's stages:
  * STAGE | query | stageId | wall_ms | tasks | name-head |
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stage-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tuning.configureShuffle(spark, Seq(sfDir), cpus.toInt)
    try {
      graft.engine.GraphiteTables.index(spark, sfDir).count()
      graft.engine.GraphiteTables.tags(spark, sfDir).count()
      graft.engine.GraphiteTables.points(spark, sfDir).count()
      graft.engine.GraphiteTables.pointsTagged(spark, sfDir).count()
    } catch { case _: Throwable => }

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, String)]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (record) {
          val info = s.stageInfo
          val ms = (for {
            a <- info.completionTime; b <- info.submissionTime
          } yield a - b).getOrElse(-1L)
          stages.add((info.stageId, ms, info.numTasks, info.name.take(60)))
        }
    })
    val names = args.headOption.map(_.split(',').toSeq).getOrElse(Nil)
    for (name <- names) {
      try {
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e6
        }
        once()
        stages.clear(); record = true
        val w = once()
        record = false
        Thread.sleep(300) // let the listener bus drain
        println(f"STAGEQ | $name | total=${w}%.0f ms")
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(_._1).foreach { case (id, ms, nt, nm) =>
          println(s"STAGE | $name | $id | $ms | $nt | $nm |")
        }
      } catch {
        case e: Throwable =>
          println(s"STAGE-ERR $name ${Option(e.getMessage).getOrElse("?").take(160)}")
      }
    }
    spark.stop()
  }
}
