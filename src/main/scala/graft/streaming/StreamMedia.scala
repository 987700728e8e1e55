package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.Multimodal

/** Streaming multimodal curation — the ingest-side twin of the batch
  * codec operators ([[graft.llm.Multimodal]]): decode-validate at the
  * firehose, featurize, and dedup on DECODED pixel content before the
  * payload lands.
  *
  * Why decoded-content identity matters: the same image re-encoded
  * (different compressor, different quality of a lossless format,
  * PNG vs BMP of identical pixels) has different BYTES, so a
  * byte-hash dedup ([[StreamDedup]]'s contract for text) misses it.
  * Hashing the decoded pixel grid catches exactly that class —
  * the common case for scraped media, where the same asset arrives
  * through many CDNs and thumbnailing pipelines.
  *
  * Plan shape (streaming-legal by construction): the decode gate +
  * feature extraction are a stateless `mapPartitions` over each
  * micro-batch (payloads never leave their partition; corrupt inputs
  * drop, the batch-side skip policy), and the only stateful operator
  * is `dropDuplicatesWithinWatermark` keyed on the 64-bit pixel hash,
  * whose state is O(arrival rate × lateness) — independent of corpus
  * size, the same bound as every other streaming stage here.
  */
object StreamMedia {

  /** FNV-1a over the decoded RGB grid (plus dims, so a solid 2×8 and
    * a solid 4×4 of one color differ) — a cheap deterministic
    * decoded-content identity. 64-bit: at 1e9 images/day the in-
    * horizon collision odds stay negligible (birthday bound over the
    * watermark window, not the corpus).
    */
  private[streaming] def pixelHash(img: java.awt.image.BufferedImage): Long = {
    var h = 0xcbf29ce484222325L
    def mix(v: Int): Unit = { h ^= (v & 0xffffffffL); h *= 0x100000001b3L }
    mix(img.getWidth); mix(img.getHeight)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        mix(img.getRGB(x, y) & 0xffffff)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Decode gate + featurize: (doc_id, event_time, payload) in →
    * (doc_id, event_time, width, height, pixel_hash, feature[3+bins])
    * out; undecodable payloads are dropped (skip policy), the payload
    * itself does NOT flow on (fixed-width rows only — at ingest rates
    * the raw bytes go to the store via their own sink, not through
    * the dedup state).
    */
  def decodeGate(stream: DataFrame, bins: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("event_time", TimestampType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("pixel_hash", LongType, nullable = false),
      StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    stream.select(col("doc_id"), col("event_time"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          // skip policy must cover THROWN decode failures too: a
          // recognized-but-truncated payload makes ImageIO.read throw
          // (not return null), and an uncaught throw is a poison pill
          // — the deterministic micro-batch fails on every retry and
          // the query never progresses past it
          val img = Multimodal.decodeImageOrNull(r.getAs[Array[Byte]]("payload"))
          Option(img).map { im =>
            Row(r.getLong(0), r.getAs[java.sql.Timestamp](1),
              im.getWidth, im.getHeight, pixelHash(im),
              Multimodal.imageFeatures(im, bins).toSeq)
          }
        }
      }(enc)
  }

  /** Full ingest stage: decode gate → first-seen dedup on decoded
    * pixel content within the lateness horizon. Append-mode safe.
    */
  def pipeline(
      stream: DataFrame,
      lateness: String = "10 minutes",
      bins: Int = 8): DataFrame =
    decodeGate(stream, bins)
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark("pixel_hash")
}
