package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the shuffle-ELIMINATION play for joins and
  * aggregations that repeat on the same key (points ⋈ index on path,
  * arrivals ⋈ store on content key, embeddings ⋈ assignments on id).
  * A table written with `bucketBy(n, key)` is physically
  * hash-partitioned on disk; Spark then plans joins between two
  * tables bucketed the same way — and aggregations on the bucket
  * key — WITHOUT an Exchange: at 100 TB that converts the dominant
  * shuffle of every ingest-dedup / render-join cycle into a purely
  * local merge (`BucketingSpec` pins the no-Exchange plans).
  *
  * Sorting within buckets (`sortCols`) additionally removes the sort
  * of a sort-merge join. Bucket counts must match across tables meant
  * to co-join; pick them for the TARGET corpus (buckets ≈ corpus /
  * healthy-partition-size), not the current one — they are a write-
  * time contract, like the reference's fixed shard keys.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted parquet table in the
    * session catalog (overwrites).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      numBuckets: Int,
      bucketCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    require(numBuckets > 0 && bucketCols.nonEmpty, "buckets and keys required")
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
