package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

object DriveScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // drive StreamAnomaly end to end over a MemoryStream: 30 training
    // values then one 10-sigma spike — exactly one flagged row expected
    val stream = MemoryStream[(String, Long, Double)]
    val input = stream.toDF().select(
      col("_1").as("event_type"), col("_2").as("t"), col("_3").as("value"))
    val out = graft.streaming.StreamAnomaly.zscores(input, minN = 30L, threshold = 3.0)
    val q = out.writeStream.format("memory").queryName("drive_anom")
      .outputMode("append").start()
    stream.addData((0 until 30).map(i =>
      ("cpu", i.toLong, 10.0 + (if (i % 2 == 0) 0.5 else -0.5))))
    q.processAllAvailable()
    stream.addData(Seq(("cpu", 99L, 60.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("drive_anom").collect()
    println("MARKER flagged=" + rows.length +
      " row=" + rows.headOption.map(_.toString).getOrElse("none"))
    spark.stop()
  }
}
