package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixed-shape micro pipeline timed under conf variations in one
  * session: what does a shuffle stage COST at bench scale, and which
  * session confs move that floor? The pipeline (range → roundrobin
  * repartition → groupBy agg → self-join → agg → noop) is data-tiny,
  * so its wall time ≈ pure scheduling/AQE/codegen floor.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-floor-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pipeline(tag: Int): Unit = {
      val base = spark.range(0L, 100000L, 1L, 4)
        .select((col("id") + tag).as("id"), pmod(col("id"), lit(97)).as("k"))
      val agg = base.repartition(32).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("id").as("s"))
      val j = agg.as("a").join(agg.as("b"), "k")
        .groupBy().agg(sum(col("a.n") * col("b.s")).as("x"))
      j.write.mode("overwrite").format("noop").save()
    }
    def timeRuns(label: String, n: Int): Unit = {
      val times = (0 until n).map { i =>
        val t0 = System.nanoTime()
        pipeline(i)
        (System.nanoTime() - t0) / 1e3 / 1e3
      }
      println(f"FLOOR | $label | min=${times.min}%.0f ms | med=${times.sorted.apply(n / 2)}%.0f | all=${times.map(t => f"$t%.0f").mkString(",")}")
    }
    // warm codegen/JIT
    timeRuns("warmup", 6)
    timeRuns("default", 8)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    timeRuns("parallelismFirst=false", 8)
    spark.conf.unset("spark.sql.adaptive.coalescePartitions.parallelismFirst")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    timeRuns("coalesce=off", 8)
    spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timeRuns("aqe=off", 8)
    spark.conf.unset("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.exchange.reuse", "true")
    timeRuns("default-again", 8)
    spark.stop()
  }
}
