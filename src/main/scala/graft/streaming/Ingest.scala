package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.engine.GraphiteTables

/** Streaming ingest (SURVEY §2.9) — the engine-owned replacement for
  * carbon-clickhouse + carbonlink: Structured Streaming over the
  * graphite plaintext protocol, maintaining the points table and the
  * index/tags side tables (with ancestor expansion per
  * `doc/index-table.md:20-38`) in `foreachBatch`.
  *
  * Late/duplicate handling mirrors the reference end to end: every
  * write carries a `version`; storage is append-only (ReplacingMergeTree
  * analog) and the read path's `max_by(value, version)` dedup
  * (`Render.dedup`) resolves duplicates — so ingest needs no
  * exactly-once coordination, only at-least-once appends.
  */
object Ingest {

  /** Parse graphite plaintext lines `path value timestamp` — tagged
    * form `name;k=v;k2=v2` is normalized to the sorted storage form
    * `name?k=v&k2=v2` (`finder/tagged.go:551-596`; tag order pinned by
    * sort). Malformed lines are dropped (null-safe casts).
    * Columns in: `value: String`; out: full points-table schema plus
    * `is_tagged`.
    *
    * Known simplification: tag values are stored raw (carbon-clickhouse
    * percent-escapes structural chars at ingest; `Tagged.escape` /
    * `encodePath` provide the round-trip-safe encoding when values may
    * contain `%`/`&`/`?`/`;` — the line protocol itself already
    * excludes whitespace and `;` from values).
    */
  def parseLines(lines: DataFrame): DataFrame = {
    val f = split(trim(col("value")), "\\s+")
    // `get` (not getItem) tolerates short arrays → nulls → dropped
    val rawPath = get(f, lit(0))
    val isTagged = rawPath.contains(";")
    val name = substring_index(rawPath, ";", 1)
    val kvs = array_sort(slice(split(rawPath, ";"), 2, 1000))
    val storagePath =
      when(isTagged, concat(name, lit("?"), array_join(kvs, "&")))
        .otherwise(rawPath)
    val time = get(f, lit(2)).try_cast("long")
    lines.select(
      storagePath.as("path"),
      get(f, lit(1)).try_cast("double").as("value"),
      time.as("time"),
      to_date(timestamp_seconds(time)).as("date"),
      // write version: the metric timestamp (carbon-clickhouse uses
      // the receive time; any monotone source works for max-wins)
      time.as("version"),
      // tagged paths are never reversed (`pkg/reverse/reverse.go:24-28`)
      when(isTagged, lit(null).cast("string"))
        .otherwise(GraphiteTables.reversePath(rawPath)).as("path_reversed"),
      isTagged.as("is_tagged"))
      .where(col("path").isNotNull && col("value").isNotNull && col("time").isNotNull)
  }

  /** Per-batch maintenance: append new points, and upsert-by-append
    * the index rows (plain metrics, ancestor-expanded) and tag rows
    * (tagged metrics) derived from the batch's distinct paths. The
    * distinct is per-batch-sized; read-side version dedup gives
    * ReplacingMergeTree semantics across batches.
    */
  def processBatch(parsed: DataFrame, outDir: String): Unit = {
    parsed.cache()
    try {
      parsed
        .write.mode("append")
        .partitionBy("date")
        .parquet(s"$outDir/points")

      // per (path, day): the reference's carbon writer emits daily
      // index/tag rows for every active day (`doc/index-table.md`)
      val newMetrics = parsed
        .groupBy("path", "is_tagged", "date")
        .agg(max("version").as("version"))
        .cache()

      GraphiteTables.expandIndexRows(
        newMetrics.where(!col("is_tagged")).select("path", "date", "version"))
        .write.mode("append").parquet(s"$outDir/index")

      GraphiteTables.expandTagRows(
        newMetrics.where(col("is_tagged")).select("path", "date", "version"))
        .write.mode("append").parquet(s"$outDir/tags")
    } finally parsed.unpersist()
  }

  /** Wire a line stream into the three tables. Caller starts/awaits
    * the returned query.
    */
  def stream(lines: DataFrame, outDir: String, checkpoint: String): DataStreamWriter[Row] =
    parseLines(lines)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, _: Long) => processBatch(batch, outDir))

  /** In-stream exact-duplicate suppression within the lateness bound
    * (SURVEY §2.9): watermark + `dropDuplicatesWithinWatermark` on the
    * full write identity. Read-side `max_by(version)` dedup remains
    * the correctness backstop for duplicates arriving later than the
    * watermark — matching the reference's ReplacingMergeTree +
    * read-dedup split exactly.
    */
  def withStreamDedup(parsed: DataFrame, lateness: String = "1 hour"): DataFrame =
    parsed
      .withColumn("event_time", timestamp_seconds(col("time")))
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark("path", "time", "version")
      .drop("event_time")

  /** Streaming tumbling rollup (§2.9 "Windows"): watermarked
    * event-time windows, partial aggregates maintained by the state
    * store, append-mode emission once the watermark passes the window
    * end. The step must match the retention the hot tier serves.
    */
  def streamingRollup(lines: DataFrame, stepSeconds: Int, lateness: String = "30 seconds"): DataFrame =
    parseLines(lines)
      .withColumn("event_time", timestamp_seconds(col("time")))
      .withWatermark("event_time", lateness)
      .groupBy(col("path"), window(col("event_time"), s"$stepSeconds seconds"))
      .agg(avg(col("value")).as("value"), count(lit(1)).as("n"))
      .select(col("path"),
        col("window.start").cast("long").as("time"),
        col("value"), col("n"))
}
