package graft.model

import org.apache.spark.sql.types._

/** Core request/data model of the engine.
  *
  * Mirrors the reference's logical tables
  * (`tests/clickhouse/rollup/init.sql`) re-expressed as Spark
  * schemas per SURVEY §1.4: the reversed-path twin table becomes a
  * `path_reversed` column; version-based dedup stays a read-side
  * concern.
  */
object Schemas {

  /** Points table: one row per datapoint write. `date` duplicates
    * `time`'s day for partition pruning; `version` is the write
    * version (max wins on duplicate (path, time)).
    */
  val points: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("time", LongType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("path_reversed", StringType, nullable = true)))

  /** Metric-name index: one metric expands into daily/all-time ×
    * direct/reversed rows, ancestors carry a trailing dot
    * (`doc/index-table.md`).
    */
  val index: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("level", IntegerType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("version", LongType, nullable = false)))

  /** Tagged-series inverted index: one row per (tag, series) with
    * that tag in `tag1`; `path` is the url-encoded form
    * `name?k1=v1&k2=v2`.
    */
  val tags: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("tag1", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("version", LongType, nullable = false)))

  /** Index level-offset constants (`finder/index.go:19-23`). */
  val ReverseLevelOffset = 10000
  val TreeLevelOffset = 20000
  val ReverseTreeLevelOffset = 30000

  /** Constant date carried by all-time index rows
    * (`finder/index.go:24`).
    */
  val DefaultTreeDate = "1970-02-12"
}

/** One render request window (`render/data/multi_target.go:21-28`). */
final case class TimeFrame(from: Long, until: Long, maxDataPoints: Long = 1048576L)

/** Engine feature flags affecting tagged `=`/`!=` semantics
  * (`config/config.go` FeatureFlags; e2e `feature_flags_*` dirs).
  */
final case class FeatureFlags(
    useCarbonBehavior: Boolean = false,
    dontMatchMissingTags: Boolean = false)
