package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch end-to-end drive harness (test scope, not shipped). */
object DriveScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String)]
    val input = stream.toDF().select(
      col("_1").as("doc_id"),
      timestamp_seconds(col("_2")).as("event_time"),
      col("_3").as("text"))
    val out = graft.streaming.StreamDedup.firstSeenNormalized(
      input, col("text"), lateness = "100 seconds")
    val q = out.writeStream.format("memory").queryName("drive_dedup")
      .outputMode("append").start()
    stream.addData(Seq((1L, 100L, "the cat"), (2L, 105L, "THE  cat"), (3L, 110L, "a dog")))
    q.processAllAvailable()
    stream.addData(Seq((4L, 130L, "the cat")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("drive_dedup").select("doc_id").as[Long].collect().sorted.toSeq
    println("DRIVE_DEDUP_IDS " + rows.mkString(","))
    spark.stop()
  }
}
