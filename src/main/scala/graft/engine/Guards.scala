package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-protection guards — the Spark-native analog of the
  * reference's per-duration ClickHouse query params and its storage
  * error surface:
  *
  *   - duration-banded query params (`config/config.go:207-212`,
  *     selection `config.go:1045-1053` + `binarySearchQueryParamLe`
  *     `config.go:182-206`, applied per query window in
  *     `render/data/query.go:131-138` and
  *     `render/data/multi_target.go:71-89`);
  *   - read limits, which the reference delegates to ClickHouse's
  *     `max_rows_to_read` / `max_result_bytes` / `max_memory_usage`
  *     URL settings and maps back to HTTP 403
  *     (`helper/clickhouse/clickhouse.go:65-93`);
  *   - data/index timeouts mapped to HTTP 504 "Storage read timeout"
  *     (`helper/clickhouse/clickhouse.go:118-126`).
  *
  * The Spark translation: limits are enforced by a metadata-bounded
  * pre-flight over the pruned scan (parquet footer statistics + plan
  * stats — cheap at any scale because predicate/partition pruning has
  * already happened by the time the estimate runs), and timeouts are
  * enforced by running the storage action under a deadline in a job
  * group that is **cancelled** on expiry — on a shared cluster the
  * cancellation is the point: a runaway 100 TB scan must release its
  * executors, not just abandon its caller.
  */
object Guards {

  /** Read limits of one query-param band. 0 = unlimited, like the
    * absent URL setting in the reference.
    */
  final case class ReadLimits(
      maxRowsToRead: Long = 0L,
      maxResultBytes: Long = 0L,
      maxMemoryUsage: Long = 0L)

  object ReadLimits {
    /** Scrape the limit settings out of a ClickHouse-style URL's query
      * string (`?max_rows_to_read=1&max_memory_usage=1&readonly=2`) —
      * the reference carries limits as URL params verbatim
      * (`config.go:210`); unknown params are storage-specific knobs the
      * Spark engine has no use for and are ignored.
      */
    def fromUrl(url: String): ReadLimits = {
      val query = url.indexOf('?') match {
        case -1 => ""
        case i  => url.substring(i + 1)
      }
      var l = ReadLimits()
      query.split("&").foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) =>
            val n = try v.toLong catch { case _: NumberFormatException => 0L }
            k match {
              case "max_rows_to_read"  => l = l.copy(maxRowsToRead = n)
              case "max_result_bytes"  => l = l.copy(maxResultBytes = n)
              case "max_memory_usage"  => l = l.copy(maxMemoryUsage = n)
              case _                   =>
            }
          case _ =>
        }
      }
      l
    }
  }

  /** One band: applies to query windows of duration ≥ `durationSec`
    * (until a later band's threshold takes over). The default band has
    * `durationSec = 0`.
    */
  final case class QueryParam(
      durationSec: Long,
      dataTimeoutSec: Long = 0L,
      limits: ReadLimits = ReadLimits())

  /** The runtime band list always leads with the default band built
    * from the base url/data-timeout (`config.go:625-631`); declared
    * bands keep config order and must carry a positive duration
    * (`config.go:606-613` — a zero duration is a config error there).
    */
  def withDefault(default: QueryParam, declared: Seq[QueryParam]): IndexedSeq[QueryParam] = {
    require(declared.forall(_.durationSec > 0), "query duration param not set")
    (default.copy(durationSec = 0L) +: declared).toIndexedSeq
  }

  /** Index of the band in charge of a window of `durationSec`: the
    * LAST band with threshold ≤ duration, falling back to the default
    * (`config.GetQueryParam` + `binarySearchQueryParamLe` semantics —
    * the list is expected sorted by ascending duration, as the
    * reference requires of the config author).
    */
  def select(params: IndexedSeq[QueryParam], durationSec: Long): QueryParam = {
    var best = 0
    var i = params.length - 1
    while (i > 0 && best == 0) {
      if (params(i).durationSec <= durationSec) best = i
      i -= 1
    }
    params(best)
  }

  /** A storage-layer refusal with its HTTP status — what
    * `helper/clickhouse.HandleError` reconstructs from ClickHouse
    * error text, thrown directly here since the engine IS the storage.
    */
  final case class StorageError(code: Int, message: String)
      extends RuntimeException(message)

  /** Metadata-bounded pre-flight scan estimate: row count of the
    * pruned scan (after predicate pushdown this reads parquet footers
    * and the surviving pages of the count's zero-column projection,
    * never the full-width rows the query would deliver) and the
    * optimizer's size estimate for the same plan (pure metadata).
    */
  def scanEstimate(pruned: DataFrame): (Long, BigInt) =
    (pruned.count(), pruned.queryExecution.optimizedPlan.stats.sizeInBytes)

  /** Enforce a band's limits against a pre-flight estimate. Arguments
    * are by-name so an unlimited band costs nothing. Error text mirrors
    * the reference's reconstructed messages ("Storage read limit for
    * rows …" / "… for memory", `clickhouse.go:65-93`).
    */
  def checkReadLimits(limits: ReadLimits, rows: => Long, bytes: => BigInt): Unit = {
    if (limits.maxRowsToRead > 0 || limits.maxResultBytes > 0 || limits.maxMemoryUsage > 0) {
      val r = rows
      if (limits.maxRowsToRead > 0 && r > limits.maxRowsToRead)
        throw StorageError(403,
          s"Storage read limit for rows (would read $r rows, max_rows_to_read = ${limits.maxRowsToRead})")
      lazy val b = bytes
      if (limits.maxResultBytes > 0 && b > limits.maxResultBytes)
        throw StorageError(403,
          s"Storage read limit for result bytes (estimated $b bytes, max_result_bytes = ${limits.maxResultBytes})")
      if (limits.maxMemoryUsage > 0 && b > limits.maxMemoryUsage)
        throw StorageError(403, "Storage read limit for memory")
    }
  }

  /** Run a storage action under a deadline. The body executes on a
    * dedicated thread inside its own Spark job group; if the deadline
    * expires the job group is cancelled (freeing the executors — the
    * Spark analog of the reference's context cancellation killing the
    * ClickHouse HTTP request) and the caller gets the reference's 504.
    * `timeoutSec <= 0` means no deadline (`data-timeout` unset).
    */
  def withDeadline[T](spark: SparkSession, timeoutSec: Long, what: String = "read")(body: => T): T = {
    if (timeoutSec <= 0) return body
    val group = s"graft-deadline-${java.util.UUID.randomUUID()}"
    @volatile var out: Option[Either[Throwable, T]] = None
    val worker = new Thread(
      () => {
        spark.sparkContext.setJobGroup(group, s"guarded storage $what", interruptOnCancel = true)
        try out = Some(Right(body))
        catch { case e: Throwable => out = Some(Left(e)) }
        finally spark.sparkContext.clearJobGroup()
      },
      s"graft-deadline-worker")
    worker.setDaemon(true)
    worker.start()
    worker.join(timeoutSec * 1000L)
    if (worker.isAlive) {
      // The deadline can fire before the body's first job is even
      // registered with the scheduler — a single cancel would be a
      // no-op and the stragglers would pin their executors until the
      // tasks finish on their own. Keep cancelling from a daemon
      // reaper until the worker dies, while the caller gets its 504
      // immediately.
      val reaper = new Thread(
        () => {
          var rounds = 0
          while (worker.isAlive && rounds < 300) {
            spark.sparkContext.cancelJobGroup(group)
            worker.interrupt()
            worker.join(100L)
            rounds += 1
          }
        },
        "graft-deadline-reaper")
      reaper.setDaemon(true)
      reaper.start()
      throw StorageError(504, "Storage read timeout")
    }
    out match {
      case Some(Right(v)) => v
      case Some(Left(e))  => throw e
      case None           => throw StorageError(504, "Storage read timeout")
    }
  }
}
