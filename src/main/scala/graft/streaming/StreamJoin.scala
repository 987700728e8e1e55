package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream correlation join with PROVABLY bounded state — the
  * attribution primitive (impression ⋈ conversion within a window).
  * Both sides carry watermarks and the join carries a time-range
  * predicate, which together let Spark EVICT state: a left row whose
  * event time has fallen `windowSec + latenessSec` behind the
  * watermark can never match a future right row and is dropped, so
  * state is O(rate × (window + lateness)) — never stream length. An
  * unconstrained stream-stream join would hold both streams forever;
  * the range condition is not an optimization but the thing that
  * makes infinite joins finite.
  */
object StreamJoin {

  /** Inner-join `left` and `right` on `keyCol`, keeping pairs where
    * the right event lands within `[left time, left time + windowSec]`.
    * Both time columns must be TimestampType; output carries the left
    * row's columns plus the right's (caller aliases to avoid
    * collisions — `keyCol` is coalesced to one column).
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      windowSec: Long,
      latenessSec: Long = 0L): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val lateness = s"$latenessSec seconds"
    val l = left.withWatermark(leftTimeCol, lateness)
    val r = right.withWatermark(rightTimeCol, lateness)
    l.join(r,
      l(keyCol) === r(keyCol) &&
        col(rightTimeCol) >= col(leftTimeCol) &&
        col(rightTimeCol) <= col(leftTimeCol) + expr(s"INTERVAL $windowSec SECONDS"),
      "inner")
      .drop(r(keyCol))
  }
}
