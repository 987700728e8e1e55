package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Lineage.TruncateOps

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * IMAGE, AUDIO and VIDEO decode are all REAL, with no external
  * dependency: the JDK itself ships the needed codecs
  * (`javax.imageio` — PNG/JPEG/BMP/GIF; `javax.sound.sampled` —
  * WAV/PCM) and MJPEG-in-AVI is a plain RIFF container around JPEG
  * frames, so [[aviBytes]]/[[aviFrames]] complete the video path
  * in pure JDK too. [[withPayload]]/[[extractFeatures]]/[[resize]]/
  * [[sampleFrames]] remain as the format-agnostic opaque-payload
  * contract exercise (deterministic byte statistics — documented
  * fakes, kept because their outputs are SQL-oracle-checkable
  * byte-for-byte where codec streams are not).
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
  // the JDK ships these — so the decode step is not a stub for any
  // modality (video's RIFF/MJPEG path is further below).
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
    encodePng(img)
  }

  /** One PNG writer per executor thread (same rationale as the JPEG
    * pair below: SPI lookup + construction per row is pure overhead,
    * writers are reusable but not thread-safe).
    */
  private val pngWriter =
    new ThreadLocal[javax.imageio.ImageWriter] {
      override def initialValue(): javax.imageio.ImageWriter =
        javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    }

  private[llm] def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = pngWriter.get()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), null)
    } finally ios.close()
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
    // per-row PNG encode is the cost here, not the scan — spread a
    // single-split input across the session before the codec work
    graft.Tuning.spreadTinyInput(docs.select(col("doc_id"), col("text")))
      .mapPartitions { rows =>
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
  private[graft] def imageFeatures(
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
  /** Decode-or-skip: the corrupt-input policy in ONE place. Returns
    * null for a null payload, an unrecognized format (ImageIO's null
    * return), or a recognized-but-corrupt payload (ImageIO THROWS for
    * those — e.g. a truncated PNG body — and an uncaught throw would
    * fail the task deterministically on every retry: a poison pill,
    * not a skipped row).
    */
  /** One PNG reader per executor thread (decode twin of [[pngWriter]],
    * same rationale as the JPEG pair below). `ImageIO.read`'s generic
    * path costs, PER IMAGE: a format-sniffing SPI scan, a fresh reader
    * construction, and — with `ImageIO.getUseCache`'s default `true` —
    * a temp FILE-backed `ImageInputStream` whose create/delete turns
    * every in-memory decode into two filesystem metadata ops; 32
    * concurrent codec tasks then contend on the tmp directory (the
    * round-16 spread A/B measured the PNG-decode queries bimodal
    * under 32-way parallelism for exactly this reason).
    */
  private val pngReader =
    new ThreadLocal[javax.imageio.ImageReader] {
      override def initialValue(): javax.imageio.ImageReader =
        javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    }

  /** The 8-byte PNG signature (ISO/IEC 15948 §5.2). */
  private val PngMagic: Array[Byte] =
    Array(0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def hasPngMagic(payload: Array[Byte]): Boolean = {
    if (payload.length < PngMagic.length) return false
    var i = 0
    while (i < PngMagic.length) {
      if (payload(i) != PngMagic(i)) return false
      i += 1
    }
    true
  }

  private[graft] def decodeImageOrNull(payload: Array[Byte]): java.awt.image.BufferedImage =
    try {
      if (payload == null) null
      else if (hasPngMagic(payload)) {
        // known-PNG fast path: per-thread reader over a memory-backed
        // stream — no SPI scan, no temp file. Decode errors fall
        // through to the skip policy like the generic path.
        val reader = pngReader.get()
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          reader.setInput(iis)
          reader.read(0)
        } finally iis.close()
      }
      else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    } catch { case _: Exception => null }

  def extractImageFeatures(withPayloads: DataFrame, bins: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloads.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        // undecodable payloads drop (corrupt-input policy: skip, don't kill the job)
        val img = decodeImageOrNull(r.getAs[Array[Byte]]("payload"))
        Option(img).map(im =>
          Row(r.getLong(0), im.getWidth, im.getHeight,
            imageFeatures(im, bins).toSeq))
      }
    }(enc)
  }

  /** Luminance-entropy quality score over the REAL decode path — the
    * blank/degenerate-image filter of a media-curation pipeline: a
    * 16-bin histogram of integer luminance (299r+587g+114b, exact),
    * Shannon entropy `ln(n) − (Σ c·ln c)/n` with every `c·ln c` term
    * floored to the 2^-20 grid IN BIN ORDER before summing (the
    * unigram twin's engine-portability recipe — quantized terms +
    * exact double sums make the DuckDB twin bit-reproducible). Flat
    * or near-constant images score ≈ 0; rich images approach ln 16.
    */
  def imageEntropy(withPayloads: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_pixels", LongType, nullable = false),
      StructField("entropy", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloads.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val img = decodeImageOrNull(r.getAs[Array[Byte]]("payload"))
        Option(img).map { im =>
          val w = im.getWidth; val h = im.getHeight
          val counts = new Array[Long](16)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = im.getRGB(x, y)
              val lum = 299 * ((rgb >> 16) & 0xff) +
                587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
              counts(lum * 16 / 255001) += 1
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          var s = 0.0
          var b = 0
          while (b < 16) {
            val c = counts(b)
            if (c > 1) s += math.floor(c * math.log(c.toDouble) * 1048576.0) / 1048576.0
            b += 1
          }
          val ent = math.floor((math.log(n.toDouble) - s / n) * 1048576.0) / 1048576.0
          Row(r.getLong(0), n, ent)
        }
      }
    }(enc)
  }

  /** Own nearest-neighbor rescale kernel with a PINNED index formula:
    * destination pixel (x, y) samples source pixel
    * (x·srcW / dstW, y·srcH / dstH) (integer floor division). AWT's
    * `drawImage` nearest-neighbor leaves the sample grid
    * implementation-defined; this kernel makes the resize
    * SQL-reproducible (the m_png_resize oracle recomputes the same
    * grid arithmetically), at identical per-pixel cost.
    */
  private[graft] def nearestNeighbor(
      src: java.awt.image.BufferedImage, dstW: Int, dstH: Int): java.awt.image.BufferedImage = {
    val srcW = src.getWidth; val srcH = src.getHeight
    val dst = new java.awt.image.BufferedImage(
      dstW, dstH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < dstH) {
      val sy = y * srcH / dstH
      var x = 0
      while (x < dstW) {
        dst.setRGB(x, y, src.getRGB(x * srcW / dstW, sy) & 0xffffff)
        x += 1
      }
      y += 1
    }
    dst
  }

  /** REAL resize: decode → [[nearestNeighbor]] rescale (deterministic
    * across JVMs AND engines — pinned index formula, unlike
    * interpolated filters or AWT's NN grid) → PNG re-encode, meta
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
        val src = decodeImageOrNull(r.getAs[Array[Byte]]("payload"))
        Option(src).map { im =>
          Row(r.getLong(0), encodePng(nearestNeighbor(im, targetW, targetH)),
            Row(targetW, targetH, "image/png"))
        }
      }
    }(enc)
  }

  /** Perceptual difference-hash bits of one decoded image:
    * [[nearestNeighbor]] downsample to a (gridW+1)×gridH grid (the
    * pinned index formula again — SQL-reproducible), integer
    * luminance 299r+587g+114b per cell, one bit per horizontal
    * gradient `lum(x+1,y) > lum(x,y)`. gridW·gridH ≤ 62 keeps the
    * fingerprint strictly inside checked BIGINT shifts in every
    * engine (the same constraint that sizes the Bloom words).
    */
  private[graft] def dhashBits(
      img: java.awt.image.BufferedImage, gridW: Int, gridH: Int): Long = {
    val g = nearestNeighbor(img, gridW + 1, gridH)
    def lum(x: Int, y: Int): Int = {
      val rgb = g.getRGB(x, y)
      299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
    }
    var fp = 0L
    var y = 0
    while (y < gridH) {
      var x = 0
      while (x < gridW) {
        if (lum(x + 1, y) > lum(x, y)) fp |= 1L << (y * gridW + x)
        x += 1
      }
      y += 1
    }
    fp
  }

  /** Perceptual fingerprints over the REAL decode path — the media
    * twin of [[Dedup.simhashDF]]: near-duplicate IMAGES (rescales,
    * re-encodes, small edits) land at small Hamming distance, exact
    * re-encodes at distance 0. 100 TB shape: payloads never leave
    * their partition; one 56-bit long per image does.
    */
  def dhash(withPayloads: DataFrame, gridW: Int = 7, gridH: Int = 8): DataFrame = {
    require(gridW >= 1 && gridH >= 1 && gridW * gridH <= 62,
      "dhash fingerprint must fit checked BIGINT shifts")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("fp", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloads.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val img = decodeImageOrNull(r.getAs[Array[Byte]]("payload"))
        Option(img).map(im => Row(r.getLong(0), dhashBits(im, gridW, gridH)))
      }
    }(enc)
  }

  /** The corpus-scale fingerprint: a 16×8 downsample grid → 15
    * horizontal-gradient bits per row → 120 bits in TWO longs (rows
    * 0–3 in `fp_lo`, rows 4–7 in `fp_hi`, 60 bits each — inside
    * checked BIGINT shifts). Sized by the SCALE_NOTES round-11
    * finding: fixed-width LSH banding is linear only while
    * n ≪ 2^band_bits, and 56 bits caps bands at 14 bits (birthday
    * collisions become real near n ≈ 10⁵); 120 bits gives four
    * 30-BIT bands — the d < 4 recall guarantee kept, the random
    * collision term shrunk by 2¹⁶.
    */
  private[graft] def dhashWideBits(
      img: java.awt.image.BufferedImage): (Long, Long) = {
    val g = nearestNeighbor(img, 16, 8)
    def lum(x: Int, y: Int): Int = {
      val rgb = g.getRGB(x, y)
      299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
    }
    var lo = 0L; var hi = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 15) {
        if (lum(x + 1, y) > lum(x, y)) {
          if (y < 4) lo |= 1L << (y * 15 + x)
          else hi |= 1L << ((y - 4) * 15 + x)
        }
        x += 1
      }
      y += 1
    }
    (lo, hi)
  }

  /** Wide perceptual fingerprints (doc_id, fp_lo, fp_hi) — same
    * map-only shape as [[dhash]], twice the bits.
    */
  def dhashWide(withPayloads: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("fp_lo", LongType, nullable = false),
      StructField("fp_hi", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloads.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val img = decodeImageOrNull(r.getAs[Array[Byte]]("payload"))
        Option(img).map { im =>
          val (lo, hi) = dhashWideBits(im)
          Row(r.getLong(0), lo, hi)
        }
      }
    }(enc)
  }

  /** Banded pairs over [[dhashWide]] fingerprints: four 30-bit bands
    * (two per long), exact Hamming verify across both longs. Same
    * semantics as [[dhashPairs]] with the candidate volume's random
    * (birthday) term n²/2^band_bits shrunk 2¹⁶ below the 56-bit form.
    *
    * Scale contract (SCALE_NOTES round-11 finding 6, measured): at
    * 30-bit bands the candidate:answer ratio is a CONSTANT ~1.2× from
    * 5 k to 500 k docs — the join feeds the verifier almost nothing
    * but true matches. What remains superlinear is the ANSWER: pair
    * density at a fixed radius is a corpus property, and any corpus
    * whose near-dup density is a constant fraction has a quadratic
    * pair list no listing operator can avoid. When the consumer is
    * dedup (keep/drop, not pair inspection), use [[dhashDedupWide]],
    * whose candidate AND output volumes are O(n) by construction.
    */
  /** Corpus-adaptive band count for Hamming-banded LSH — SCALE_NOTES
    * finding 4's rule ("fixed-width banding is linear only while
    * n ≪ 2^band_bits; size bands to the corpus like you size shuffle
    * partitions") promoted into code, the perceptual-hash counterpart
    * of `Dedup.lshPlan`. Picks the LARGEST band count (best recall —
    * pairs at Hamming distance d < bands are guaranteed candidates)
    * whose band width still bounds the random (birthday) candidate
    * term: `w ≥ ceil(log₂ n) + margin` keeps expected random
    * candidates ≤ bands·n/2^(margin+1) — at the default margin 8,
    * ≲ n/64 rows of join noise at any corpus size. Falls back to the
    * widest available band when even that cannot cover `needed`
    * (candidates stay bounded; guaranteed-recall radius shrinks —
    * callers with corpus-specific recall floors pass bands
    * explicitly). At n = 500 k over 120 bits the rule returns 4
    * (4×30-bit bands) — exactly the configuration finding 6 measured
    * at a constant ~1.2× candidate:answer ratio.
    *
    * Band counts are the divisors of `nBits` with ≥ 2 bands, so a
    * band is at most `nBits/2` wide (fits a long for both fingerprint
    * layouts in use: 120-bit two-long and ≤ 60-bit single-long).
    */
  def dhashPlan(n: Long, nBits: Int, margin: Int = 8, minBands: Int = 2): Int = {
    val widths = bandWidths(nBits)
    val needed = ceilLog2(math.max(n, 2L)) + margin
    val b = widths.find(_ >= needed).map(nBits / _).getOrElse(nBits / widths.max)
    // Recall floor: for SHORT fingerprints (e.g. 32-bit audio
    // signatures) the noise rule alone collapses to the widest band
    // at any n ≥ 2 (ceilLog2+margin exceeds nBits/2), silently
    // shrinking the guaranteed-candidate Hamming radius. A caller
    // with a recall requirement pins minBands; the floor wins over
    // the birthday bound by design — a short key space saturates at
    // large n regardless of banding, so recall is the one knob left.
    math.max(b, minBands)
  }

  /** The same rule as a DuckDB/ANSI-SQL CASE over a row-count
    * expression — emitted from the SAME width list so an oracle twin
    * can never band differently than [[dhashPlan]]:
    * `w ≥ ceilLog2(n) + margin  ⟺  n ≤ 2^(w − margin)`; the
    * `minBands` clamp is applied per branch, mirroring the Scala max.
    */
  def dhashPlanSqlCase(
      nBits: Int, margin: Int, nExpr: String, minBands: Int = 2): String = {
    val widths = bandWidths(nBits)
    val fallback = math.max(nBits / widths.max, minBands)
    val branches = widths.filter(_ > margin).map { w =>
      s"WHEN $nExpr <= ${1L << (w - margin)} THEN ${math.max(nBits / w, minBands)}"
    }
    // Every width <= margin → zero branches; a branchless CASE is
    // invalid SQL while the Scala twin still returns the widest-band
    // fallback — emit the bare constant so the twins agree.
    if (branches.isEmpty) s"$fallback"
    else s"(CASE ${branches.mkString(" ")} ELSE $fallback END)"
  }

  /** Candidate band widths for an `nBits` fingerprint, ascending:
    * divisors of nBits that leave ≥ 2 bands. */
  private[graft] def bandWidths(nBits: Int): Seq[Int] =
    (1 to nBits / 2).filter(nBits % _ == 0)

  private[graft] def ceilLog2(n: Long): Int =
    64 - java.lang.Long.numberOfLeadingZeros(n - 1)

  /** (doc_id, fp_lo, fp_hi, b, v) band rows of a wide-fingerprint
    * relation — ONE spelling of the two-long banded layout, shared by
    * [[dhashPairsWide]] and [[dhashDedupWide]] so the two can never
    * band differently. `bands` must divide 120; band `i` is bits
    * `[i·w, (i+1)·w)` of the 120-bit fingerprint (rows 0–3 in the low
    * 60 bits of `fp_lo`, rows 4–7 in `fp_hi`), with straddling bands
    * composed from both longs. At the historical `bands = 4` this
    * reproduces the original 4×30 layout bit-for-bit.
    */
  private[graft] def wideBands(fps: DataFrame, bands: Int = 4): DataFrame = {
    require(120 % bands == 0 && bands >= 2 && 120 / bands <= 60,
      s"bands must divide 120 with width <= 60, got $bands")
    val w = 120 / bands
    def slice(i: Int): Column = {
      val o = i * w
      val mask = (1L << w) - 1L
      if (o + w <= 60) shiftright(col("fp_lo"), o).bitwiseAND(lit(mask))
      else if (o >= 60) shiftright(col("fp_hi"), o - 60).bitwiseAND(lit(mask))
      else {
        // straddle: top (60-o) bits of fp_lo, low (o+w-60) bits of fp_hi
        val hiPart = col("fp_hi").bitwiseAND(lit((1L << (o + w - 60)) - 1L))
        shiftright(col("fp_lo"), o).bitwiseOR(shiftleft(hiPart, 60 - o))
      }
    }
    val slices = (0 until bands).map(i =>
      struct(lit(i).as("b"), slice(i).as("v")))
    fps.select(col("doc_id"), col("fp_lo"), col("fp_hi"),
      explode(array(slices: _*)).as("s"))
      .select(col("doc_id"), col("fp_lo"), col("fp_hi"),
        col("s.b").as("b"), col("s.v").as("v"))
  }

  def dhashPairsWide(fps: DataFrame, maxDist: Int = 20, bands: Int = 4): DataFrame = {
    val banded = wideBands(fps, bands)
    val a = banded.select(col("doc_id").as("id_a"), col("fp_lo").as("lo_a"),
      col("fp_hi").as("hi_a"), col("b"), col("v"))
    val bnd = banded.select(col("doc_id").as("id_b"), col("fp_lo").as("lo_b"),
      col("fp_hi").as("hi_b"), col("b"), col("v"))
    a.join(bnd, Seq("b", "v"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
          bit_count(col("hi_a").bitwiseXOR(col("hi_b")))).cast("long").as("dist"))
      .distinct()
      .where(col("dist") <= maxDist)
  }

  /** Keep-first perceptual dedup over [[dhashWide]] fingerprints —
    * the shape that stays LINEAR even when the corpus's near-dup pair
    * density is quadratic (SCALE_NOTES round-11 finding 6: at radius
    * 20/120 bits ~0.4% of ALL pairs qualify on the synthetic corpus,
    * so the pair LIST grows n² no matter how the candidates are
    * generated — but dedup never needed the list).
    *
    * Two stages, both linear. (1) EXACT collapse: identical
    * fingerprints group to their eldest (one hash-agg — the pixel-dup
    * cliques that make band buckets hot vanish here, and an exact dup
    * can never survive, which a bucket-anchor pass alone cannot
    * promise: every bucket of a dup can be anchored by some
    * *different* image beyond the radius). (2) ANCHOR pass over the
    * now-distinct fingerprints: each band bucket's eldest member is
    * its anchor; a doc is DROPPED iff some bucket it occupies has an
    * earlier anchor within `maxDist`. Candidates are one probe per
    * (distinct fp, band) — ≤ 4n rows against a ≤-bucket-count anchor
    * relation — and the output is the surviving docs, ≤ n rows.
    * Single-pass by design: an anchor that is itself dropped (met an
    * even earlier anchor in another bucket) still shields its bucket —
    * its survivors chain to ITS anchor's cluster transitively, the
    * same chain property minhash keep-first has before clustering.
    * The transitive variant (full CC over verified pairs, as
    * `Dedup.nearDupKeep` does for minhash) remains available via
    * [[dhashPairsWide]] when pair volume permits.
    */
  def dhashDedupWide(fps: DataFrame, maxDist: Int = 20, bands: Int = 4): DataFrame = {
    val reps = fps.groupBy("fp_lo", "fp_hi")
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("fp_lo"), col("fp_hi"))
    val banded = wideBands(reps, bands)
    // struct min orders by doc_id first ⇒ the anchor's own fp rides
    // along without a second join back to `fps`
    val anchors = banded.groupBy("b", "v")
      .agg(min(struct(col("doc_id"), col("fp_lo"), col("fp_hi"))).as("a"))
      .select(col("b"), col("v"), col("a.doc_id").as("anchor_id"),
        col("a.fp_lo").as("lo_a"), col("a.fp_hi").as("hi_a"))
    val dropped = banded.join(anchors, Seq("b", "v"))
      .where(col("doc_id") > col("anchor_id") &&
        (bit_count(col("fp_lo").bitwiseXOR(col("lo_a"))) +
          bit_count(col("fp_hi").bitwiseXOR(col("hi_a")))) <= maxDist)
      .select(col("doc_id")).distinct()
    reps.join(dropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("fp_lo"), col("fp_hi"))
  }

  /** Band slices of a single-long fingerprint column: struct(b, v)
    * for each of `bands` contiguous `nBits/bands`-bit slices — THE one
    * spelling of the single-long banding layout. [[dhashPairs]],
    * [[fpAnchorDedup]], [[videoNearDups]] and the streaming media
    * index ([[graft.streaming.StreamMediaAdmit.fpBands]]) all consume
    * it: a divergent copy would silently de-synchronize probe recall
    * between the batch and streaming paths.
    */
  private[graft] def fpBandSlices(fp: Column, nBits: Int, bands: Int): Seq[Column] = {
    require(nBits % bands == 0, "bands must divide the fingerprint width")
    val bw = nBits / bands
    val mask = (1L << bw) - 1L
    (0 until bands).map(b => struct(lit(b).as("b"),
      shiftright(fp, b * bw).bitwiseAND(lit(mask)).as("v")))
  }

  /** Keep-first anchor dedup over single-long fingerprints — the
    * [[dhashDedupWide]] shape generalized to any (doc_id, fp)
    * relation ([[dhash]] 56-bit image codes, [[audioFingerprint]]
    * frame-energy codes): identical fingerprints collapse to their
    * eldest first (one hash-agg — an exact dup can never survive),
    * then each band bucket's eldest remaining member anchors it and a
    * doc drops iff some bucket anchor ≤ `maxDist` precedes it.
    * Candidates = bands·distinct-fp rows, output ≤ n — linear at any
    * corpus size (SCALE_NOTES finding 6's argument, modality-generic).
    */
  def fpAnchorDedup(
      fps: DataFrame, nBits: Int = 56, bands: Int = 4, maxDist: Int = 10): DataFrame = {
    val reps = fps.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("fp"))
    val slices = fpBandSlices(col("fp"), nBits, bands)
    val banded = reps.select(col("doc_id"), col("fp"),
      explode(array(slices: _*)).as("s"))
      .select(col("doc_id"), col("fp"), col("s.b").as("b"), col("s.v").as("v"))
    val anchors = banded.groupBy("b", "v")
      .agg(min(struct(col("doc_id"), col("fp"))).as("a"))
      .select(col("b"), col("v"), col("a.doc_id").as("anchor_id"),
        col("a.fp").as("fp_a"))
    val dropped = banded.join(anchors, Seq("b", "v"))
      .where(col("doc_id") > col("anchor_id") &&
        bit_count(col("fp").bitwiseXOR(col("fp_a"))) <= maxDist)
      .select(col("doc_id")).distinct()
    reps.join(dropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("fp"))
  }

  /** Banded-LSH candidate pairs over [[dhash]] fingerprints, verified
    * by exact Hamming distance: the fingerprint splits into `bands`
    * bit-slices, a pair collides if ANY band matches (two fps within
    * Hamming d agree on ≥1 band whenever d < bands — the simhash
    * pigeonhole), and candidates are verified with one `bit_count`
    * xor. The join key is (band index, band value) — never an
    * all-pairs cross — so candidate volume tracks true duplicate
    * density, not corpus².
    */
  def dhashPairs(
      fps: DataFrame, nBits: Int = 56, bands: Int = 4, maxDist: Int = 10): DataFrame = {
    val slices = fpBandSlices(col("fp"), nBits, bands)
    val banded = fps.select(col("doc_id"), col("fp"),
      explode(array(slices: _*)).as("s"))
    val a = banded.select(col("doc_id").as("id_a"), col("fp").as("fp_a"),
      col("s.b").as("b"), col("s.v").as("v"))
    val bnd = banded.select(col("doc_id").as("id_b"), col("fp").as("fp_b"),
      col("s.b").as("b"), col("s.v").as("v"))
    a.join(bnd, Seq("b", "v"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long").as("dist"))
      .distinct()
      .where(col("dist") <= maxDist)
  }

  /** Transitive perceptual clusters over [[dhash]] fingerprints —
    * the cluster-KEY shape (leakage-safe splits, survivor picks) as
    * opposed to the pair-LIST shape ([[dhashPairs]], whose answer is
    * quadratic on dup-dense corpora BY DEFINITION).
    *
    * The round-14 ×10 probe caught `d_split_media` paying 17.5×/decade:
    * 102× the pairs (32k → 3.29M) pushed `Dedup.clusters` past its
    * driver union-find bound into the distributed loop (1.6 → 54 s).
    * The pair blowup is identical-fingerprint cliques (k² pairs per
    * clique) — but a CLUSTER consumer never needed the clique's pair
    * list: collapse identical fps to their eldest doc (one hash-agg,
    * the [[dhashDedupWide]] stage-1 move), run banded pairs + CC over
    * the ≤-distinct-fp representatives, then map every doc through its
    * fp. Result-IDENTICAL to CC over the full pair graph: dist-0
    * clique members share every band slice and sit in one component
    * with their representative, band collision is a pure function of
    * the fp, and min-doc_id-per-component survives the collapse
    * (each representative IS its clique's min). The d_split_media
    * DuckDB twin still computes the full-pair-graph recursive-CTE CC —
    * the equivalence is hash-gated every round.
    */
  def dhashClusters(
      fps0: DataFrame,
      maxDist: Int = 10,
      nBits: Int = 56,
      bands: Int = 4): DataFrame = {
    // one codec pass per action, not three: (doc_id, fp) is consumed
    // by the collapse, the pair generator, and the final map-back
    val fps = fps0.select(col("doc_id"), col("fp")).truncateLineageDeferred()
    val rep = fps.groupBy(col("fp"))
      .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("rep_id"))
    val pairs = dhashPairs(
        rep.select(col("rep_id").as("doc_id"), col("fp")), nBits, bands, maxDist)
      .select("id_a", "id_b")
    val cl = graft.llm.Dedup.clusters(pairs).withColumnRenamed("id", "rep_id")
    fps.select(col("doc_id"), col("fp"))
      .join(rep, Seq("fp"))
      .join(cl, Seq("rep_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("rep_id")).as("cluster_id"))
  }

  /** LINEAR leakage-safe cluster key over [[dhash]] fingerprints —
    * the anchor-edge form of [[dhashClusters]] for corpora whose
    * verified near-dup pair mass is quadratic (SCALE_NOTES finding
    * 13: the radius-10 transitive key over the synthetic corpus is
    * ≥ pair-mass work BY DEFINITION — 330M verified pairs at ×100 —
    * so the verified-CC chain cannot finish no matter how it's
    * planned).
    *
    * Construction: collapse identical fps to their eldest doc (the
    * [[dhashClusters]] stage-1 hash-agg), band the representatives,
    * and connect each representative to its band bucket's eldest
    * member (the [[dhashDedupWide]] anchor machinery) — a STAR per
    * bucket, ≤ `bands`·|distinct fps| edges by construction, never
    * the in-bucket pair cross. CC over those stars IS the connected
    * components of the band-COLLISION graph (two reps are in one
    * component iff a chain of shared buckets links them, each bucket
    * contracted through its anchor).
    *
    * Contract vs the verified key: candidates are generated by band
    * collision and only then Hamming-verified, so the verified pair
    * graph is a SUBGRAPH of the collision graph — every verified
    * cluster sits wholly inside one anchor cluster (the
    * coarser-or-equal refinement `ImageCodecSpec` pins). Coarser is
    * the SAFE direction for a train/val/test split key: a true
    * near-dup pair can never straddle the split; the price is some
    * over-grouping from random band collisions (mass distributes
    * across `bands` random slices, so spurious merges need a 14-bit
    * coincidence per link). The min-id labels also survive: each
    * component's min doc id is a representative (reps are their
    * fp-clique minima) and CC labels components by min rep id.
    */
  def dhashAnchorClusters(
      fps0: DataFrame,
      nBits: Int = 56,
      bands: Int = 4): DataFrame = {
    // materialize the (doc_id, fp) relation ONCE: it is consumed by
    // the rep collapse AND the final map-back, and its derivation is
    // usually the codec chain (PNG encode+decode per doc) — without
    // the cut every action pays the codec twice. 16 bytes/doc.
    val fps = fps0.select(col("doc_id"), col("fp")).truncateLineageDeferred()
    val rep = fps.groupBy(col("fp"))
      .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("rep_id"))
    val slices = fpBandSlices(col("fp"), nBits, bands)
    val banded = rep.select(col("rep_id").as("doc_id"),
        explode(array(slices: _*)).as("s"))
      .select(col("doc_id"), col("s.b").as("b"), col("s.v").as("v"))
    val anchors = banded.groupBy("b", "v")
      .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("anchor_id"))
    val edges = banded.join(anchors, Seq("b", "v"))
      .where(col("doc_id") > col("anchor_id"))
      .select(col("anchor_id").as("id_a"), col("doc_id").as("id_b"))
      .distinct()
    val cl = graft.llm.Dedup.clusters(edges).withColumnRenamed("id", "rep_id")
    fps.select(col("doc_id"), col("fp"))
      .join(rep, Seq("fp"))
      .join(cl, Seq("rep_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("rep_id")).as("cluster_id"))
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
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The JDK's WAVE `AudioFileWriter` / `AudioFileReader` providers,
    * resolved ONCE through the public `ServiceLoader` SPI and reused
    * per call. Every `AudioSystem.write` / `getAudioInputStream` call
    * re-enumerates providers through a SYNCHRONIZED static registry
    * (`JDK13Services.getProviders`), so 32 concurrent codec tasks
    * serialize on one monitor — the round-16 spread A/B measured the
    * audio queries 1.9–2.3× SLOWER when parallelized, i.e. the lock,
    * not the codec, was the bottleneck. The providers themselves are
    * the same JDK classes `AudioSystem` would pick (WAVE round-trip
    * parity pinned in `ImageCodecSpec`'s audio block), and reader/writer instances
    * are stateless per call, so one shared instance is thread-safe.
    */
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    var found: javax.sound.sampled.spi.AudioFileWriter = null
    while (found == null && it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
        found = w
    }
    require(found != null, "no WAVE AudioFileWriter provider on this JVM")
    found
  }

  private lazy val audioReaders: Array[javax.sound.sampled.spi.AudioFileReader] = {
    val b = Array.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    while (it.hasNext) b += it.next()
    val all = b.result()
    // Probe ONCE with a canonical WAVE sample and move the accepting
    // provider to the front: a REJECTING provider's sniff can itself
    // consult a synchronized registry per call (the JDK midi soft
    // reader walks `MidiSystem.getProviders` before saying "not
    // mine" — a round-16 thread dump showed 31/32 executor threads
    // BLOCKED on that monitor). With the WAVE reader first, per-row
    // reads never reach the rejecting providers at all; non-WAVE
    // payloads still fall through the rest in original order.
    val probe = try wavBytes(0L, nSamples = 16) catch { case _: Exception => null }
    if (probe == null) all
    else {
      val accepted = all.indexWhere { r =>
        try { r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)).close(); true }
        catch { case _: Exception => false }
      }
      if (accepted <= 0) all
      else all(accepted) +: (all.take(accepted) ++ all.drop(accepted + 1))
    }
  }

  /** `AudioSystem.getAudioInputStream`'s
    * first-recognizing-provider rule over the cached provider list —
    * identical acceptance semantics (providers signal "not mine" with
    * `UnsupportedAudioFileException` and the stream supports
    * mark/reset), minus the synchronized registry lookup per call.
    */
  private def audioInputStream(
      in: java.io.InputStream): javax.sound.sampled.AudioInputStream = {
    var i = 0
    while (i < audioReaders.length) {
      try return audioReaders(i).getAudioInputStream(in)
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
      i += 1
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "Stream of unsupported format")
  }

  /** REAL WAV decode + features: JDK audio parser → PCM samples →
    * (n_samples, rms, zero_crossings). Returns None for undecodable
    * payloads (same skip policy as images).
    */
  private[llm] def audioFeatures(payload: Array[Byte]): Option[(Long, Double, Long)] =
    try {
      val ais = audioInputStream(new java.io.ByteArrayInputStream(payload))
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

  /** Frame-energy audio fingerprint bits over decoded PCM — the audio
    * twin of [[dhashBits]] (an energy-gradient variant in the spirit
    * of Haitsma & Kalker 2002's audio fingerprint, mono-band): the
    * samples split into `frames` equal frames, E_f = Σ v² accumulated
    * as an EXACT integer (16-bit v → v² ≤ 2³⁰, × frame length stays
    * far inside Long), bit f set iff E_{f+1} > E_f. `frames − 1 ≤ 62`
    * keeps the fingerprint inside checked BIGINT shifts both engines.
    * Returns None for undecodable payloads (image skip policy).
    */
  /** Exact per-frame PCM energies (Σv², integer) from a real WAV
    * decode — the ONE energy spelling shared by [[audioFpBits]] and
    * [[audioSegments]].
    */
  private[llm] def audioFrameEnergies(
      payload: Array[Byte], frames: Int): Option[Array[Long]] =
    try {
      val ais = audioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        val per = n / frames
        if (per == 0) None
        else {
          val e = new Array[Long](frames)
          var i = 0
          while (i < per * frames) {
            val lo = bytes(2 * i) & 0xff
            val hi = bytes(2 * i + 1).toInt
            val v =
              if (fmt.isBigEndian) ((bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff))
              else ((hi << 8) | lo)
            e(i / per) += v.toLong * v
            i += 1
          }
          Some(e)
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  private[llm] def audioFpBits(payload: Array[Byte], frames: Int): Option[Long] =
    audioFrameEnergies(payload, frames).map { e =>
      var fp = 0L
      var f = 0
      while (f < frames - 1) {
        if (e(f + 1) > e(f)) fp |= 1L << f
        f += 1
      }
      fp
    }

  /** VAD-style silence segmentation over the REAL decode path — the
    * trim-silence / speech-extent primitive of audio curation: a
    * frame is VOICED iff `4·energy > max frame energy` (an exact
    * integer comparison, no float threshold), and consecutive
    * same-voicing frames merge into numbered segments
    * (doc_id, seg_no, voiced, start_frame, end_frame). All-silent
    * clips yield one unvoiced segment. Map-only; the twin replays
    * the generator-formula energies (pinned against this decoder by
    * the m_afp gate) through per-doc windows.
    */
  /** Run-merge of the voicing flags: (seg_no from 1, voiced,
    * start_frame, end_frame) — the segmentation rule isolated for
    * direct differential testing.
    */
  private[llm] def energySegments(
      e: Array[Long]): Seq[(Long, Boolean, Long, Long)] = {
    val emax = e.max
    val voiced = e.map(x => 4 * x > emax)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean, Long, Long)]
    var segNo = 0L
    var start = 0
    var f = 1
    while (f <= e.length) {
      if (f == e.length || voiced(f) != voiced(f - 1)) {
        segNo += 1
        out += ((segNo, voiced(start), start.toLong, (f - 1).toLong))
        start = f
      }
      f += 1
    }
    out.toSeq
  }

  def audioSegments(docs: DataFrame, frames: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("seg_no", LongType, nullable = false),
      StructField("voiced", BooleanType, nullable = false),
      StructField("start_frame", LongType, nullable = false),
      StructField("end_frame", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    graft.Tuning.spreadTinyInput(docs.select(col("doc_id")))
      .mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        audioFrameEnergies(wavBytes(id), frames).toSeq.flatMap(e =>
          energySegments(e).map { case (segNo, voiced, s0, s1) =>
            Row(id, segNo, voiced, s0, s1)
          })
      }
    }(enc)
  }

  /** Perceptual audio fingerprints (seed-keyed REAL WAV payloads,
    * decoded per partition): near-duplicate AUDIO lands at small
    * Hamming distance. Pairs via the same banded machinery as
    * [[dhashPairs]] — the fingerprint column contract is shared.
    */
  def audioFingerprint(docs: DataFrame, frames: Int = 32): DataFrame = {
    require(frames >= 2 && frames - 1 <= 62, "fingerprint must fit checked BIGINT shifts")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("fp", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    graft.Tuning.spreadTinyInput(docs.select(col("doc_id")))
      .mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        audioFpBits(wavBytes(id), frames).map(fp => Row(id, fp))
      }
    }(enc)
  }

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
    graft.Tuning.spreadTinyInput(docs.select(col("doc_id")))
      .mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        audioFeatures(wavBytes(id)).map { case (n, rms, zc) =>
          Row(id, n, rms, zc)
        }
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // REAL video codec — MJPEG-in-AVI. AVI is a plain RIFF container
  // (fourcc-tagged chunks, little-endian sizes, even-byte padding) and
  // MJPEG frames are ordinary JPEGs, so the pure JDK covers the whole
  // path: this file writes a spec-complete AVI (hdrl with avih + one
  // 'vids'/'MJPG' stream, movi with one '00dc' chunk per frame, idx1)
  // and parses it back, with `javax.imageio` doing per-frame JPEG
  // work. The byte-stat fake above remains only as the format-agnostic
  // opaque-payload contract exercise; every modality (image, audio,
  // video) now has a genuine codec.
  //
  // The 100 TB shape of frame sampling: the container walk is a
  // sequential scan of chunk HEADERS (8 bytes each), so non-sampled
  // frames are skipped without JPEG-decoding them — decode cost scales
  // with sampled frames, I/O with payload bytes, and only fixed-width
  // rows leave the partition.
  // ------------------------------------------------------------------

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** One RIFF chunk: fourcc + little-endian size + data, padded to an
    * even byte boundary (size records the UNPADDED length, per spec).
    */
  private def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
    val pad = data.length & 1
    val out = new java.io.ByteArrayOutputStream(8 + data.length + pad)
    out.write(fourcc(cc)); out.write(le32(data.length)); out.write(data)
    if (pad == 1) out.write(0)
    out.toByteArray
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(12 + body.length)
    out.write(fourcc("LIST")); out.write(le32(4 + body.length))
    out.write(fourcc(listType)); out.write(body)
    out.toByteArray
  }

  /** Encode JPEG frames into a spec-complete MJPEG AVI: RIFF('AVI ')
    * { LIST hdrl { avih, LIST strl { strh 'vids'/'MJPG', strf
    * BITMAPINFOHEADER } }, LIST movi { '00dc'… }, idx1 }.
    */
  def aviBytes(jpegFrames: Seq[Array[Byte]], w: Int, h: Int, fps: Int = 10): Array[Byte] = {
    val maxFrame = if (jpegFrames.isEmpty) 0 else jpegFrames.map(_.length).max
    val avih = {
      val b = new java.io.ByteArrayOutputStream(56)
      b.write(le32(1000000 / math.max(fps, 1))) // dwMicroSecPerFrame
      b.write(le32(maxFrame * fps))             // dwMaxBytesPerSec
      b.write(le32(0))                          // dwPaddingGranularity
      b.write(le32(0x10))                       // dwFlags: AVIF_HASINDEX
      b.write(le32(jpegFrames.length))          // dwTotalFrames
      b.write(le32(0))                          // dwInitialFrames
      b.write(le32(1))                          // dwStreams
      b.write(le32(maxFrame))                   // dwSuggestedBufferSize
      b.write(le32(w)); b.write(le32(h))
      (0 until 4).foreach(_ => b.write(le32(0))) // dwReserved
      b.toByteArray
    }
    val strh = {
      val b = new java.io.ByteArrayOutputStream(56)
      b.write(fourcc("vids")); b.write(fourcc("MJPG"))
      b.write(le32(0))                          // dwFlags
      b.write(le16(0)); b.write(le16(0))        // wPriority, wLanguage
      b.write(le32(0))                          // dwInitialFrames
      b.write(le32(1)); b.write(le32(fps))      // dwScale / dwRate
      b.write(le32(0))                          // dwStart
      b.write(le32(jpegFrames.length))          // dwLength (frames)
      b.write(le32(maxFrame))                   // dwSuggestedBufferSize
      b.write(le32(-1))                         // dwQuality (default)
      b.write(le32(0))                          // dwSampleSize (varies)
      b.write(le16(0)); b.write(le16(0))        // rcFrame left/top
      b.write(le16(w)); b.write(le16(h))        // rcFrame right/bottom
      b.toByteArray
    }
    val strf = {
      val b = new java.io.ByteArrayOutputStream(40)
      b.write(le32(40))                         // biSize
      b.write(le32(w)); b.write(le32(h))
      b.write(le16(1)); b.write(le16(24))       // biPlanes / biBitCount
      b.write(fourcc("MJPG"))                   // biCompression
      b.write(le32(w * h * 3))                  // biSizeImage
      b.write(le32(0)); b.write(le32(0))        // biXPels / biYPels
      b.write(le32(0)); b.write(le32(0))        // biClrUsed / biClrImportant
      b.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviBody = new java.io.ByteArrayOutputStream()
    val idxBody = new java.io.ByteArrayOutputStream(16 * jpegFrames.length)
    jpegFrames.foreach { jf =>
      // idx1 offsets point at the chunk fourcc, relative to 'movi'+4
      idxBody.write(fourcc("00dc")); idxBody.write(le32(0x10)) // AVIIF_KEYFRAME
      idxBody.write(le32(4 + moviBody.size())); idxBody.write(le32(jf.length))
      moviBody.write(chunk("00dc", jf))
    }
    val movi = list("movi", moviBody.toByteArray)
    val body = hdrl ++ movi ++ chunk("idx1", idxBody.toByteArray)
    val out = new java.io.ByteArrayOutputStream(12 + body.length)
    out.write(fourcc("RIFF")); out.write(le32(4 + body.length))
    out.write(fourcc("AVI ")); out.write(body)
    out.toByteArray
  }

  /** JDK JPEG encode of a seeded gradient frame. Gradients compress
    * gently (low high-frequency energy), so decoded pixels land close
    * to the encoded ones — pinned by VideoCodecSpec's error bound.
    */
  def jpegFrame(seed: Array[Byte], w: Int, h: Int, frameNo: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // non-wrapping ramps (base/2 ≤ 127 + ramp ≤ 127 stays in 0..254):
    // a mod-256 wrap would be a hard edge, exactly what JPEG mangles
    val base = (if (seed.isEmpty) 0 else seed(frameNo % seed.length) & 0xff) >> 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = base + (x * 127) / math.max(w - 1, 1)
        val g = base + (y * 127) / math.max(h - 1, 1)
        val b = math.min(base + frameNo * 16, 255)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = jpegWriter.get()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.92f)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally ios.close()
    bos.toByteArray
  }

  /** One JPEG writer per executor thread: ImageIO's SPI lookup +
    * writer construction per frame is measurable overhead at
    * thousands of frames per partition, and writers are reusable but
    * NOT thread-safe — a ThreadLocal is the correct sharing scope
    * inside `mapPartitions` (task threads are long-lived in an
    * executor, so this amortizes across all tasks a thread runs).
    */
  private val jpegWriter =
    new ThreadLocal[javax.imageio.ImageWriter] {
      override def initialValue(): javax.imageio.ImageWriter =
        javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    }

  /** Decode twin of [[jpegWriter]]: AVI '00dc' chunks are KNOWN to be
    * JPEG, so skip `ImageIO.read`'s per-call format sniff + SPI scan
    * and reuse one reader per thread. None on undecodable bytes
    * (same skip policy as everywhere else).
    */
  private val jpegReader =
    new ThreadLocal[javax.imageio.ImageReader] {
      override def initialValue(): javax.imageio.ImageReader =
        javax.imageio.ImageIO.getImageReadersByFormatName("jpg").next()
    }

  private[llm] def decodeJpeg(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      val reader = jpegReader.get()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        Option(reader.read(0))
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Walk the RIFF tree and return the movi-list frame chunks
    * ('00dc'/'00db') as (frameNo, jpegBytes) WITHOUT decoding them —
    * sampling filters on frameNo before any JPEG work. Malformed
    * payloads yield an empty list (skip policy, same as images).
    */
  def aviFrames(payload: Array[Byte]): Seq[(Int, Array[Byte])] = {
    def u32(off: Int): Long =
      ((payload(off) & 0xffL)) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
    def cc(off: Int): String =
      new String(payload, off, 4, "US-ASCII")
    try {
      if (payload.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ")
        return Seq.empty
      val frames = Seq.newBuilder[(Int, Array[Byte])]
      var n = 0
      // walk top-level chunks; recurse only into LIST movi. ALL size
      // arithmetic in Long: a crafted chunk size with the high bit
      // set would turn negative as an Int and walk the pointer
      // BACKWARDS — an infinite loop on malformed input, which hangs
      // an executor task (worse than the exception the skip policy
      // already absorbs).
      var off = 12L
      val end = math.min(8L + u32(4), payload.length.toLong)
      while (off + 8 <= end) {
        val id = cc(off.toInt)
        val sz = u32(off.toInt + 4)
        if (id == "LIST" && off + 12 <= end && cc(off.toInt + 8) == "movi") {
          var p = off + 12
          val listEnd = math.min(off + 8 + sz, end)
          while (p + 8 <= listEnd) {
            val fid = cc(p.toInt)
            val fsz = u32(p.toInt + 4)
            if ((fid == "00dc" || fid == "00db") && p + 8 + fsz <= listEnd) {
              frames += ((n, java.util.Arrays.copyOfRange(
                payload, (p + 8).toInt, (p + 8 + fsz).toInt)))
              n += 1
            }
            p += 8 + fsz + (fsz & 1)
          }
        }
        off += 8 + sz + (sz & 1)
      }
      frames.result()
    } catch { case _: Exception => Seq.empty }
  }

  /** Attach REAL MJPEG-AVI payloads to the documents table: dims and
    * frame count keyed on doc_id, frame pixels seeded from the text —
    * the video twin of [[withPngPayload]].
    */
  def withAviPayload(docs: DataFrame): DataFrame = {
    val inSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", metaSchema, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(inSchema)
    // JPEG-encode of every frame dominates — spread tiny inputs first
    graft.Tuning.spreadTinyInput(docs.select(col("doc_id"), col("text")))
      .mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (8 + (id % 5)).toInt
        val h = (6 + (id % 4)).toInt
        val nFrames = (2 + (id % 4)).toInt
        val seed = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
        val avi = aviBytes(
          (0 until nFrames).map(f => jpegFrame(seed, w, h, f)), w, h)
        Row(id, avi, Row(w, h, "video/x-msvideo"))
      }
    }(enc)
  }

  /** REAL frame sampling: container walk per partition, keep every
    * `everyK`-th frame, JPEG-decode ONLY the kept ones, emit decoded
    * dims (not trusted metadata). Fully oracle-checkable: the
    * (frame_no, width, height) grid is arithmetic in doc_id, so DuckDB
    * can pin that the write→parse→decode round trip lost nothing.
    */
  def sampleVideoFrames(withPayloads: DataFrame, everyK: Int = 2): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloads.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        aviFrames(r.getAs[Array[Byte]]("payload")).iterator
          .filter { case (n, _) => n % everyK == 0 }
          .flatMap { case (n, jpeg) =>
            decodeJpeg(jpeg).map(im => Row(id, n, im.getWidth, im.getHeight))
          }
      }
    }(enc)
  }

  /** Decoded-pixel video features: per-frame mean luminance →
    * per-document (n_frames, mean luminance, motion = mean absolute
    * luminance step between consecutive frames). All frames decode
    * here (featurization wants them), still partition-local.
    */
  /** Video near-dup: per-sampled-frame [[dhashBits]] fingerprints —
    * (doc_id, frame_no, fp) — so two videos are near-duplicates when
    * enough aligned frames land at small Hamming distance
    * ([[videoNearDups]]). The frame fingerprints ride the LOSSY JPEG
    * decode, so (like `m_avi_motion`'s luminances) the VALUES are
    * codec-defined and spec-pinned rather than SQL-oracled; the
    * pipeline shape is the scale contract: payloads stay in their
    * partition, one long per sampled frame leaves.
    */
  def videoDhash(withPayloads: DataFrame, everyK: Int = 2): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloads.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        aviFrames(r.getAs[Array[Byte]]("payload")).iterator
          .filter { case (n, _) => n % everyK == 0 }
          .flatMap { case (n, jpeg) =>
            decodeJpeg(jpeg).map(im => Row(id, n, dhashBits(im, 7, 8)))
          }
      }
    }(enc)
  }

  /** Near-duplicate video pairs from [[videoDhash]] fingerprints:
    * candidate pairs via the banded equi-join on ALIGNED frames
    * (same frame_no — a re-encode keeps the timeline), then a pair
    * qualifies when ≥ `minFrac` of its co-sampled frames sit within
    * `maxDist`. Candidate volume is bucket-keyed (band, frame, value)
    * — never videos² and never frames².
    */
  def videoNearDups(
      frameFps: DataFrame,
      bands: Int = 4,
      maxDist: Int = 10,
      minFrac: Double = 0.6): DataFrame = {
    val slices = fpBandSlices(col("fp"), 56, bands)
    val banded = frameFps.select(col("doc_id"), col("frame_no"), col("fp"),
      explode(array(slices: _*)).as("s"))
    val a = banded.select(col("doc_id").as("id_a"), col("frame_no"),
      col("fp").as("fp_a"), col("s.b").as("b"), col("s.v").as("v"))
    val bnd = banded.select(col("doc_id").as("id_b"), col("frame_no"),
      col("fp").as("fp_b"), col("s.b").as("b"), col("s.v").as("v"))
    // frame-level candidates: aligned frames agreeing on >= 1 band
    val frameHits = a.join(bnd, Seq("frame_no", "b", "v"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("frame_no"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long").as("dist"))
      .distinct()
      .where(col("dist") <= maxDist)
    val nFrames = frameFps.groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
    frameHits
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_close"), avg(col("dist")).as("mean_dist"))
      .join(nFrames.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("nf", "nf_a"), Seq("id_a"))
      .join(nFrames.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("nf", "nf_b"), Seq("id_b"))
      .where(col("n_close") >= least(col("nf_a"), col("nf_b")) * minFrac)
      .select(col("id_a"), col("id_b"), col("n_close"), col("mean_dist"))
  }

  /** Frame-level banded gate for the LOSSY video leg: widens
    * `m_avi_motion`'s oracle surface from (doc_id, n_frames) to the
    * decoded luminance values themselves. Per decoded frame it emits
    *
    *  - `lum_band` — the ANALYTIC mean luminance of the generator's
    *    gradient (integer ramp sums + the frame's seed byte — pure
    *    (doc_id, text) arithmetic a SQL twin reruns exactly), floored
    *    onto a 1/`bandGrid` grid;
    *  - `lum_err_band` — `floor(|decoded − analytic| / tol)`, where
    *    `decoded` rides the REAL write→RIFF-walk→JPEG-decode round
    *    trip: 0 for every frame iff the codec chain reproduces each
    *    frame's mean luminance within `tol`;
    *  - `motion_err_band` — the same band for the doc's inter-frame
    *    motion (decoded vs analytic lum sequence), repeated per frame.
    *
    * A lossy codec stream has no exact arithmetic twin, but its ERROR
    * is boundable: measured max |decoded − analytic| over sf0.01's
    * 1,750 frames is 0.00095 (motion 0.0014 — DriveScratch `avilums`),
    * so the default `tol = 0.01` dominates ~10× while any dropped,
    * reordered or garbled frame shifts a mean luminance by whole band
    * widths. Unlike a banded DECODED value, the error band has no
    * quantization-edge hazard: it compares the two legs directly
    * instead of trusting both to round the same way near a boundary.
    */
  def videoMotionBanded(
      docs: DataFrame,
      tol: Double = 0.01,
      bandGrid: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_no", LongType, nullable = false),
      StructField("lum_band", LongType, nullable = false),
      StructField("lum_err_band", LongType, nullable = false),
      StructField("motion_err_band", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    docs.select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val text = Option(r.getString(1)).getOrElse("")
        val w = (8 + (id % 5)).toInt
        val h = (6 + (id % 4)).toInt
        val nF = (2 + (id % 4)).toInt
        val seed = text.getBytes("UTF-8")
        // decode leg: the real codec round trip
        val avi = aviBytes((0 until nF).map(f => jpegFrame(seed, w, h, f)), w, h)
        val decoded = aviFrames(avi).flatMap { case (_, j) =>
          decodeJpeg(j).map { im =>
            var s = 0.0
            var y = 0
            while (y < im.getHeight) {
              var x = 0
              while (x < im.getWidth) {
                val rgb = im.getRGB(x, y)
                s += (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                  0.114 * (rgb & 0xff)) / 255.0
                x += 1
              }
              y += 1
            }
            s / (im.getWidth * im.getHeight)
          }
        }
        // analytic leg: the generator arithmetic, op-ordered exactly
        // like the SQL twin (integer ramp sums, then one double chain)
        val sx = (0 until w).map(x => (x * 127) / (w - 1)).sum
        val sy = (0 until h).map(y => (y * 127) / (h - 1)).sum
        def analytic(f: Int): Double = {
          val base = if (seed.isEmpty) 0 else (seed(f % seed.length) & 0xff) >> 1
          val bbar = math.min(base + 16 * f, 255)
          (0.299 * (base + sx.toDouble / w) + 0.587 * (base + sy.toDouble / h) +
            0.114 * bbar) / 255.0
        }
        val an = (0 until nF).map(analytic)
        def motionOf(ls: Seq[Double]): Double =
          if (ls.length < 2) 0.0
          else ls.sliding(2).map(p => math.abs(p(1) - p(0))).sum / (ls.length - 1)
        val motionErrBand =
          math.floor(math.abs(motionOf(decoded) - motionOf(an)) / tol).toLong
        decoded.zipWithIndex.map { case (d, f) =>
          Row(id, f.toLong,
            math.floor(an(f) * bandGrid).toLong,
            math.floor(math.abs(d - an(f)) / tol).toLong,
            motionErrBand)
        }
      }
    }(enc)
  }

  def videoMotion(withPayloads: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("mean_lum", DoubleType, nullable = false),
      StructField("motion", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withPayloads.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val lums = aviFrames(r.getAs[Array[Byte]]("payload")).flatMap {
          case (_, jpeg) =>
            decodeJpeg(jpeg).map { im =>
              var s = 0.0
              var y = 0
              while (y < im.getHeight) {
                var x = 0
                while (x < im.getWidth) {
                  val rgb = im.getRGB(x, y)
                  s += (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                    0.114 * (rgb & 0xff)) / 255.0
                  x += 1
                }
                y += 1
              }
              s / (im.getWidth * im.getHeight)
            }
        }
        if (lums.isEmpty) None
        else {
          val motion =
            if (lums.length < 2) 0.0
            else lums.sliding(2).map(p => math.abs(p(1) - p(0))).sum / (lums.length - 1)
          Some(Row(r.getLong(0), lums.length.toLong,
            lums.sum / lums.length, motion))
        }
      }
    }(enc)
  }

  /** One encode→decode round trip per modality on the CALLING thread:
    * touches ImageIO's SPI plugin registry (a JVM-wide lazy scan),
    * constructs this thread's ThreadLocal PNG/JPEG writer + JPEG
    * reader, and JIT-warms the codec kernels. Bench fans this out
    * once per executor thread before timing — the r10 driver run
    * charged the whole JVM first-touch cost (~5 s) to whichever
    * codec query happened to run first (`m_avi_frames` 6.2 s driver
    * vs 0.64 s warmed-local).
    */
  def warmCodecs(): Unit = {
    decodeImageOrNull(pngBytes(Array[Byte](1, 2, 3), 4, 4))
    audioFeatures(wavBytes(7L, nSamples = 64))
    val avi = aviBytes(Seq(jpegFrame(Array[Byte](1), 8, 6, 0)), 8, 6)
    aviFrames(avi).foreach { case (_, j) => decodeJpeg(j) }
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
