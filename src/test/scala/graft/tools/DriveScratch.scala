package graft.tools

import org.apache.spark.sql.functions._
import graft.SparkTestBase

object DriveScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = graft.llm.Dedup.scrubSpans(docs, col("text"), col("doc_id"), 5)
    val plan = out.queryExecution.executedPlan.toString
    println("MARKER generates=" + "Generate".r.findAllIn(plan).length +
      " reused=" + "ReusedExchange".r.findAllIn(plan).length +
      " scans=" + "FileScan".r.findAllIn(plan).length)
    spark.stop()
  }
}
