package graft.metrics

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/** Engine-side read accounting per HTTP request — the Spark analogue of
  * the ClickHouse `X-ClickHouse-Summary` read stats the reference feeds
  * into `query.<table>.<range>.ch_read_rows` / `.ch_read_bytes`
  * (`metrics/query_metrics.go:83-114`, populated from the storage
  * response headers in `helper/clickhouse`).
  *
  * Spark-first shape: the serving thread tags its jobs with a
  * per-request job group (`SparkContext.setJobGroup` is thread-local,
  * so concurrent handlers don't cross-account), and this listener sums
  * task input metrics (records/bytes actually read from the parquet
  * store) per group. That measures what the ENGINE read — after
  * partition pruning and pushdown — which is exactly what the
  * reference's ch_* pair reports, as opposed to the rows the response
  * returned (`read_rows`).
  *
  * Listener-bus delivery is asynchronous; `drain` settles by polling
  * until two consecutive samples agree (serving-path cost a few ms,
  * bounded by `settleMs`). Slightly-late task events are telemetry
  * noise, never a correctness input.
  */
final class SparkReadStats(groupPrefix: String = SparkReadStats.GroupPrefix)
    extends SparkListener {

  private final class Totals {
    val rows = new AtomicLong()
    val bytes = new AtomicLong()
  }

  private val stageGroup = new ConcurrentHashMap[Integer, String]()
  private val totals = new ConcurrentHashMap[String, Totals]()

  override def onJobStart(job: SparkListenerJobStart): Unit = {
    val g = Option(job.properties)
      .flatMap(p => Option(p.getProperty(SparkReadStats.JobGroupProp)))
      .orNull
    if (g != null && g.startsWith(groupPrefix))
      job.stageIds.foreach(id => stageGroup.put(id, g))
  }

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val g = stageGroup.get(t.stageId)
    if (g != null && t.taskMetrics != null) {
      val tot = totals.computeIfAbsent(g, _ => new Totals)
      tot.rows.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      tot.bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
  }

  private def snapshot(group: String): (Long, Long) = {
    val t = totals.get(group)
    if (t == null) (0L, 0L) else (t.rows.get(), t.bytes.get())
  }

  /** Final (rows, bytes) for a finished request's group; removes the
    * group's state. Settles until two consecutive 5 ms samples agree
    * or `settleMs` elapses.
    */
  def drain(group: String, settleMs: Long = 50L): (Long, Long) = {
    val deadline = System.nanoTime() + settleMs * 1000000L
    var last = snapshot(group)
    var quiet = false
    while (!quiet && System.nanoTime() < deadline) {
      Thread.sleep(5)
      val cur = snapshot(group)
      quiet = cur == last
      last = cur
    }
    totals.remove(group)
    val it = stageGroup.entrySet().iterator()
    while (it.hasNext) if (it.next().getValue == group) it.remove()
    last
  }
}

object SparkReadStats {
  /** Only groups with this prefix are tracked — the listener ignores
    * unrelated jobs on a shared session.
    */
  val GroupPrefix = "graft-req-"

  /** The property `setJobGroup` stamps on jobs (stable Spark public
    * behavior; `SparkContext.setJobGroup` scaladoc).
    */
  val JobGroupProp = "spark.jobGroup.id"
}
