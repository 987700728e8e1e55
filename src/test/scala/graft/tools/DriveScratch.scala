package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch end-to-end drive harness (test scope, not shipped). */
object DriveScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("d_minhash_pairs", "e_lsh_knn", "e_neardup", "d_jaccard_pairs",
        "g_render_headline_scalable")) {
      println(s"==== PLAN $name")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
