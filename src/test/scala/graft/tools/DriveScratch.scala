package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch end-to-end drive harness (test scope, not shipped). */
object DriveScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("d_repetition", "d_scrub", "d_decontaminate")) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
        .write.mode("overwrite").format("noop").save()
      println(f"DRIVE_TIME $q ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
