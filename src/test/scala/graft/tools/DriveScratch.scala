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
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); q <- Seq("g_render_headline", "g_render_headline_scalable", "d_minhash_pairs")) {
      val dir = s"/root/testdata/$sf"
      // warm (table derivation is memoized per dir)
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      val t1 = System.nanoTime()
      val n2 = graft.SparkEntry.queries(q)(spark, dir).count()
      val t2 = System.nanoTime()
      println(f"SCALE $sf%-8s $q%-28s rows=$n%8d cold=${(t1 - t0) / 1e9}%6.2fs warm=${(t2 - t1) / 1e9}%6.2fs")
      assert(n == n2)
    }
    spark.stop()
  }
}
