package graft.tools

import graft.SparkTestBase

/** Timing scratch: steady-state per-query times. */
object DriveScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    val sfDir = sys.env.getOrElse("SCRATCH_SF", "/root/testdata/sf0.1")
    def ms(f: => Unit): Long = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000L
    }
    for (name <- args) {
      val ts = (1 to 5).map { _ =>
        ms { graft.SparkEntry.queries(name)(spark, sfDir).collect() }
      }
      println(s"MARKER $name runs=${ts.mkString(",")}ms min=${ts.min}ms")
    }
    spark.stop()
  }
}
