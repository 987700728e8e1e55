package graft.tools

import graft.SparkTestBase

object DriveScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    val names = if (args.nonEmpty) args.toSeq else Seq("d_textrank")
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      def n(pat: String) = pat.r.findAllIn(p).length
      println(s"MARKER $name scans=${n("Scan parquet")} exchanges=${n("Exchange")} " +
        s"smj=${n("SortMergeJoin") + n("ShuffledHashJoin")} bhj=${n("BroadcastHashJoin")} " +
        s"bnlj=${n("BroadcastNestedLoopJoin")} win=${n("Window")} cart=${n("CartesianProduct")}")
    }
    spark.stop()
  }
}
