package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch end-to-end drive harness (test scope, not shipped). */
object DriveScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STEP $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val cands = time("candidates") {
      graft.llm.Dedup.minhashCandidates(docs, col("text"), col("doc_id"))
        .localCheckpoint()
    }
    println("CANDS " + cands.count())
    val pairs = time("verify") {
      val sets = docs.select(col("doc_id").as("id"),
        graft.llm.Dedup.shingles(col("text"), 3).as("sh"))
      cands
        .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))) /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
        .where(col("jaccard") >= 0.5)
        .select("id_a", "id_b").localCheckpoint()
    }
    println("PAIRS " + pairs.count())
    val cl = time("clusters") {
      graft.llm.Dedup.clusters(pairs).collect()
    }
    println("CLUSTERS " + cl.length)
    spark.stop()
  }
}
