package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * IMAGE and AUDIO decode are REAL: the JDK itself ships codecs
  * (`javax.imageio` — PNG/JPEG/BMP/GIF; `javax.sound.sampled` —
  * WAV/PCM), so [[withPngPayload]]/[[extractImageFeatures]]/
  * [[resizeImages]]/[[extractWavFeatures]] encode, decode, rescale
  * and featurize genuine media with no external dependency. Only the
  * VIDEO path keeps the deterministic byte-stat fake ([[withPayload]]
  * / [[extractFeatures]] / [[resize]] / [[sampleFrames]]) — no
  * container-available codec — while still exercising the Spark-side
  * contract (schema, batch shape, partition-local processing, no
  * driver collect) end-to-end.
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

  // ------------------------------------------------------------------
  // REAL codecs — pure JDK (`javax.imageio`: PNG/JPEG/BMP/GIF;
  // `javax.sound.sampled`: WAV/PCM). No external media libraries —
  // the JDK ships these — so the decode step is no longer a stub for
  // the image/audio modalities. The byte-stat fake above remains for
  // formats the JDK cannot decode (video), clearly separated.
  // ------------------------------------------------------------------

  /** Deterministic REAL PNG payload from seed bytes: a w×h RGB image
    * whose pixels are seeded byte mixes, encoded with the JDK PNG
    * writer — a genuine, decodable image. PNG is lossless, so decoded
    * pixels (and every feature derived from them) are deterministic
    * even where the compressed byte stream differs across JDK writer
    * versions.
    */
  def pngBytes(seed: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val r = if (seed.nonEmpty) seed(i % seed.length) & 0xff else 0
        val g = if (seed.nonEmpty) seed((i * 31 + 7) % seed.length) & 0xff else 0
        val b = (i * 131) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach REAL PNG payloads to the documents table (dims keyed on
    * doc_id, pixels seeded from the text bytes): per-partition batch
    * encode, binary column out — the genuine-media twin of
    * [[withPayload]].
    */
  def withPngPayload(docs: DataFrame): DataFrame = {
    val inSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", metaSchema, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(inSchema)
    docs.select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (4 + (id % 13)).toInt
        val h = (4 + (id % 11)).toInt
        val png = pngBytes(
          Option(r.getString(1)).getOrElse("").getBytes("UTF-8"), w, h)
        Row(id, png, Row(w, h, "image/png"))
      }
    }(enc)
  }

  /** Decoded-pixel features: per-channel means plus a luminance
    * histogram — `3 + bins` fixed-width doubles per image.
    */
  private[llm] def imageFeatures(
      img: java.awt.image.BufferedImage, bins: Int): Array[Double] = {
    val out = new Array[Double](3 + bins)
    val n = (img.getWidth * img.getHeight).toDouble
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        out(0) += r / 255.0 / n
        out(1) += g / 255.0 / n
        out(2) += b / 255.0 / n
        val lum = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
        out(3 + math.min((lum * bins).toInt, bins - 1)) += 1.0 / n
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL image feature extraction: ImageIO decode per partition,
    * width/height from the DECODED image (not trusted metadata),
    * fixed-width feature vector out. The 100 TB shape: payloads never
    * leave their partition, only `3 + bins` doubles per image do.
    */
  def extractImageFeatures(withPayloads: DataFrame, bins: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloads.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        // undecodable payloads drop (corrupt-input policy: skip, don't kill the job)
        Option(img).map(im =>
          Row(r.getLong(0), im.getWidth, im.getHeight,
            imageFeatures(im, bins).toSeq))
      }
    }(enc)
  }

  /** REAL resize: decode → nearest-neighbor rescale (deterministic
    * across JVMs, unlike interpolated filters) → PNG re-encode, meta
    * from the decoded-and-scaled image.
    */
  def resizeImages(withPayloads: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", metaSchema, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloads.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        Option(src).map { im =>
          val dst = new java.awt.image.BufferedImage(
            targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = dst.createGraphics()
          try {
            g2.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
            g2.drawImage(im, 0, 0, targetW, targetH, null)
          } finally g2.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          Row(r.getLong(0), bos.toByteArray, Row(targetW, targetH, "image/png"))
        }
      }
    }(enc)
  }

  /** Deterministic REAL WAV payload: 16-bit PCM mono sine at a
    * seed-keyed frequency, written through the JDK WAV encoder.
    */
  def wavBytes(seed: Long, nSamples: Int = 800, sampleRate: Int = 8000): Array[Byte] = {
    val freq = 200.0 + (math.abs(seed) % 200)
    val amp = 0.5
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (math.sin(2 * math.Pi * freq * i / sampleRate) * amp * 32767.0).toInt
      pcm(2 * i) = (v & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL WAV decode + features: JDK audio parser → PCM samples →
    * (n_samples, rms, zero_crossings). Returns None for undecodable
    * payloads (same skip policy as images).
    */
  private[llm] def audioFeatures(payload: Array[Byte]): Option[(Long, Double, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        var sumSq = 0.0
        var zc = 0L
        var prev = 0
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i) & 0xff
          val hi = bytes(2 * i + 1).toInt
          val v =
            if (fmt.isBigEndian) ((bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff))
            else ((hi << 8) | lo)
          val s = v / 32768.0
          sumSq += s * s
          if (i > 0 && ((v < 0) != (prev < 0))) zc += 1
          prev = v
          i += 1
        }
        Some((n.toLong, math.sqrt(sumSq / math.max(n, 1)), zc))
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Attach REAL WAV payloads (seeded on doc_id) and extract decoded
    * audio features per partition.
    */
  def extractWavFeatures(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        audioFeatures(wavBytes(id)).map { case (n, rms, zc) =>
          Row(id, n, rms, zc)
        }
      }
    }(enc)
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
