package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for the named queries to files:
  * `Test/runMain graft.tools.PlanDump <outDir> <suffix> q1,q2,...`
  * writes `<outDir>/<query>_<suffix>.txt` per query, built at the
  * bench sf dir (env `SPARK_GRAFT_SF_DIR`, default sf0.1) under bench
  * session settings. The plan is the ANALYZED-then-executed one:
  * the query is run once (noop) so AQE's final plan is captured too.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <names,csv>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val names = args(2).split(',').toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tuning.configureShuffle(spark, Seq(sfDir), cpus.toInt)
    for (name <- names) {
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        df.write.mode("overwrite").format("noop").save()
        val finalPlan = df.queryExecution.executedPlan.toString
        val txt = s"== explain(formatted), pre-execution ==\n$formatted\n" +
          s"== executed plan (AQE final) ==\n$finalPlan\n"
        java.nio.file.Files.write(
          outDir.resolve(s"${name}_$suffix.txt"), txt.getBytes("UTF-8"))
        println(s"PLANDUMP ok $name")
      } catch {
        case e: Throwable =>
          println(s"PLANDUMP-ERR $name ${Option(e.getMessage).getOrElse("?").take(160)}")
      }
    }
    spark.stop()
  }
}
