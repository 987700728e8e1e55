package graft.time

/** Integer step arithmetic used by the render planner (pure).
  *
  * Reference: `/root/reference/pkg/dry/math.go`,
  * `render/data/common_step.go:29-35` (LCM of target steps),
  * `render/data/query.go:382-433` (step selection + from/until
  * alignment) and `helper/point/func.go:55-62` (grid bounds).
  */
object StepMath {

  @annotation.tailrec
  def gcd(a: Long, b: Long): Long = if (b == 0) math.abs(a) else gcd(b, a % b)

  def lcm(a: Long, b: Long): Long = if (a == 0 || b == 0) 0 else math.abs(a / gcd(a, b) * b)

  /** ceil(x / d) for positive d. */
  def ceilDiv(x: Long, d: Long): Long = if (x <= 0) x / d else (x + d - 1) / d

  def ceilToMultiplier(x: Long, m: Long): Long = ceilDiv(x, m) * m

  def floorToMultiplier(x: Long, m: Long): Long = {
    val r = x % m
    if (r < 0) (x / m - 1) * m else x / m * m
  }

  /** Combine two steps: 0 acts as identity, otherwise LCM
    * (`common_step.go:29-35`).
    */
  def combineSteps(a: Long, b: Long): Long =
    if (a == 0 || b == 0) math.max(a, b) else lcm(a, b)

  /** Step for a storage-aggregated fetch: at least the LCM of all
    * per-metric retention steps, inflated so the result has at most
    * `maxDataPoints` buckets, rounded up to a multiple of the LCM
    * (`query.go:405-413`).
    */
  def aggregatedStep(lcmStep: Long, from: Long, until: Long, maxDataPoints: Long): Long = {
    val step = math.max(lcmStep, ceilDiv(until - from, maxDataPoints))
    ceilToMultiplier(step, lcmStep)
  }

  /** Non-aggregated fetch uses max of the per-metric steps
    * (`query.go:385-393`).
    */
  def unaggregatedStep(steps: Iterable[Long]): Long =
    if (steps.isEmpty) 0 else steps.max

  /** Query-window alignment: `from' = ceil(from/step)*step`,
    * `until' = floor(until/step)*step + step - 1` (`query.go:417-420`).
    */
  def alignFromUntil(from: Long, until: Long, step: Long): (Long, Long) =
    (ceilToMultiplier(from, step), floorToMultiplier(until, step) + step - 1)

  /** Output grid bounds for gap-fill: `start = ceil(from/step)*step`
    * (via mod), `stop = floor(until/step)*step + step`, half-open
    * `[start, stop)` (`helper/point/func.go:55-62`).
    */
  def gridBounds(from: Long, until: Long, step: Long): (Long, Long) = {
    var start = from - (from % step)
    if (start < from) start += step
    val stop = until - (until % step) + step
    (start, stop)
  }
}
