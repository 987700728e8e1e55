package graft.tools

import graft.SparkTestBase

object DriveScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    val dir = "/root/testdata/sf0.01"
    val out = graft.SparkEntry.queries("ev_rfm")(spark, dir)
    // oracle SQL with DuckDB's epoch_us(ts)//1000000 translated to the
    // nanos-as-long read Spark does (ts/1e9)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet").createOrReplaceTempView("events")
    val oracle = spark.sql(
      """WITH grain AS (
        |  SELECT user_id, max(CAST(unix_micros(CAST(ts AS TIMESTAMP)) / 1000000 AS BIGINT)) AS recency,
        |         count(*) AS frequency, round(sum(value), 4) AS monetary
        |  FROM events GROUP BY 1)
        |SELECT user_id, recency, frequency, monetary,
        |  CAST(ntile(5) OVER (ORDER BY recency, user_id) AS BIGINT) AS r,
        |  CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS BIGINT) AS f,
        |  CAST(ntile(5) OVER (ORDER BY monetary, user_id) AS BIGINT) AS m
        |FROM grain""".stripMargin)
    val a = out.collect().map(_.toString).sorted
    val b = oracle.collect().map(_.toString).sorted
    println("MARKER rows=" + a.length + "/" + b.length +
      " schemaA=" + out.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(",") +
      " schemaB=" + oracle.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(",") +
      " equal=" + (a.toSeq == b.toSeq))
    spark.stop()
  }
}
