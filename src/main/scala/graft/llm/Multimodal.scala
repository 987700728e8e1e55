package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * The heavy decode step (JPEG/PNG/audio codecs) is STUBBED — the
  * container has no media libraries — with a deterministic fake
  * "decoder" over the raw bytes, so the Spark-side contract (schema,
  * batch shape, partition-local processing, no driver collect) is
  * real and tested end-to-end while the codec is swappable.
  *
  * At scale: payloads stay columnar in parquet (binary column with
  * page-level compression), the decode runs inside `mapPartitions`
  * (one JVM-local batch loop per partition, analogous to a Pandas-UDF
  * batch), and only fixed-width features leave the operator.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("meta", metaSchema, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Attach a synthetic binary payload + metadata to the documents
    * table (the testdata has no media column; the payload is the
    * utf-8 text bytes so every stage downstream is still
    * deterministic and oracle-checkable).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("meta", struct(
        (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("height"),
        lit("fake/raw").as("format")))

  /** STUB decoder: a real deployment would decode the payload with a
    * codec here; this deterministic fake derives a fixed-width
    * feature vector from byte statistics so the operator contract
    * (binary in, float vector out, partition-local batches) is
    * exercised for real.
    */
  private def fakeDecodeFeature(payload: Array[Byte], dims: Int): Array[Double] = {
    val out = new Array[Double](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    out
  }

  /** Feature extraction over payload batches: runs per-partition (the
    * Scala analog of `mapInPandas` batch processing), emitting
    * (doc_id, n_bytes, meta, feature[dims]).
    */
  def extractFeatures(withPayloads: DataFrame, dims: Int = 8): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    val fields = withPayloads.select(
      col("doc_id"), col("payload"), col("meta"))
    fields.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row(
          r.getAs[Long]("doc_id"),
          payload.length.toLong,
          r.getAs[Row]("meta"),
          fakeDecodeFeature(payload, dims).toSeq)
      }
    }(enc)
  }

  /** STUB resize: a real deployment would decode + rescale pixels; the
    * deterministic fake subsamples the payload bytes to `targetW ×
    * targetH` (stride sampling), keeping the operator contract real:
    * binary in → smaller binary + updated meta out, executed columnar
    * (`substr`-style slicing, no driver round-trip).
    */
  def resize(withPayloads: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val target = targetW * targetH
    withPayloads
      .withColumn("payload",
        expr(s"substr(payload, 1, least(length(payload), $target))"))
      .withColumn("meta", struct(
        lit(targetW).as("width"),
        lit(targetH).as("height"),
        concat(col("meta.format"), lit(";resized")).as("format")))
  }

  /** Deterministic frame sampling over a (fake) video payload: every
    * `stride`-th byte window becomes one "frame" record — exercises
    * the explode/flatMap shape of frame extraction.
    */
  def sampleFrames(withPayloads: DataFrame, stride: Int = 64): DataFrame = {
    val lastFrame = floor((length(col("payload")) - 1) / stride)
    // empty payloads produce no frames (a step-less sequence(0, -1)
    // would count DOWN and emit junk rows)
    val frames = when(length(col("payload")) > 0,
      transform(
        sequence(lit(0), greatest(lastFrame, lit(0))),
        i => struct(
          i.cast("int").as("frame_no"),
          col("payload").substr((i * stride + 1).cast("int"), lit(stride)).as("frame"))))
      .otherwise(array().cast("array<struct<frame_no:int,frame:binary>>"))
    withPayloads.select(col("doc_id"), explode(frames).as("f"))
      .select(col("doc_id"), col("f.frame_no"), length(col("f.frame")).as("frame_bytes"))
  }
}
