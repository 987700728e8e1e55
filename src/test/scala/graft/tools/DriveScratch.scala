package graft.tools

import graft.SparkTestBase

/** Census mode: executed-plan operator counts for every registered
  * query at sf0.001 → markdown table rows on stdout.
  */
object DriveScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    val sfDir = "/root/testdata/sf0.001"
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.write.mode("overwrite").format("noop").save()
        val p = df.queryExecution.executedPlan.toString
        def n(pat: String) = pat.r.findAllIn(p).length
        val scans = n("FileScan parquet")
        val ex = n("Exchange")
        val smj = n("SortMergeJoin") + n("ShuffledHashJoin")
        val bhj = n("BroadcastHashJoin")
        val bnlj = n("BroadcastNestedLoopJoin")
        val win = n("Window")
        val cart = n("CartesianProduct")
        println(s"CENSUS | $name | $scans | $ex | $smj | $bhj | $bnlj | $win | $cart |")
      } catch {
        case e: Throwable =>
          println(s"CENSUS-ERR $name ${Option(e.getMessage).getOrElse("?").take(120)}")
      }
    }
    spark.stop()
  }
}
