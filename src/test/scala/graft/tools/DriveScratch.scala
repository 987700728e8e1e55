package graft.tools
object DriveScratch {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkTestBase.spark
    for (q <- Seq("p_query_groupleft", "p_query_setop")) {
      val df = graft.SparkEntry.queries(q)(s, "/root/testdata/sf0.001")
      val p = df.queryExecution.executedPlan.toString
      println(s"MARKER $q SCANS=" + "Scan parquet".r.findAllIn(p).length +
        " REUSED=" + "ReusedExchange".r.findAllIn(p).length +
        " AQE=" + p.contains("AdaptiveSparkPlan"))
    }
  }
}
