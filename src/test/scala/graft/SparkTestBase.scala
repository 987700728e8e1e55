package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        new java.io.File("target/test-warehouse").getAbsolutePath)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // same data-derived AQE shuffle ceiling production sessions get;
    // on the sf0.001 fixtures the rule resolves to cpus (=4), so test
    // behavior is unchanged while the config path stays exercised
    Tuning.configureShuffle(s, Seq("/root/testdata/sf0.001"), 4)
    s
  }
}
