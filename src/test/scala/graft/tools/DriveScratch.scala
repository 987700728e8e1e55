package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch end-to-end drive harness (test scope, not shipped). */
object DriveScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.compiler.{GlobCompiler, Tagged}
    val df = Seq(("m?env=prod&host=web1", Seq("__name__=m","env=prod","host=web1")),
                 ("m?env=dev&host=web2", Seq("__name__=m","env=dev","host=web2"))).toDF("path","tags")
      .withColumn("tag1", explode(col("tags")))
    val Right(terms) = Tagged.parseSeriesByTag("seriesByTag('name=m','env=prod')"): @unchecked
    println("RESULT1 " + df.where(Tagged.wherePredicate(col("tag1"), col("tags"), terms)).select("path").distinct.as[String].collect.toList)
    val paths = Seq("a.b.c","a.b.d","a.x.c").toDF("path")
    println("RESULT2 " + paths.where(GlobCompiler.glob(col("path"), "a.{b,x}.c")).as[String].collect.toList)
    spark.stop()
  }
}
