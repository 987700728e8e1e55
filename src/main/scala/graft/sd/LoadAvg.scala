package graft.sd

/** Load-aware registration weight, after the reference's `load_avg`
  * package: the advertised upstream weight decays with the host's
  * normalized 1-minute load average so a degraded backend sheds
  * traffic before it falls over (`load_avg/load_avg.go:19-41`,
  * consumed by the SD register loop `sd/register.go:86-105`).
  */
object LoadAvg {

  @volatile private var stored: Double = 0.0

  /** Last stored normalized load (`load_avg.Load`). */
  def load: Double = stored

  /** Publish a normalized load (`load_avg.Store`). */
  def store(v: Double): Unit = stored = v

  /** The reference's weight curve (`load_avg/load_avg.go:19-41`),
    * bit-compatible with its test vectors (`load_avg_test.go`):
    *  - non-positive weight, degradedMultiply ≤ 1, or load ≥ 2 → 1;
    *  - load above `degradedLoad` is amplified by `degradedMultiply`;
    *  - load rounds to one decimal; zero → double weight;
    *  - otherwise `weight − weight·log10(load)`, floored at 1.
    * log10 is computed as `ln(x)·(1/ln 10)` to reproduce the
    * reference's float path exactly (its Log10 = Log · 1/Ln10; a
    * library log10 can differ by 1 ulp at e.g. 0.1 and shift the
    * truncated integer weight).
    */
  def weight(
      baseWeight: Int,
      degradedMultiply: Double,
      degradedLoad: Double,
      normalizedLoadAvg: Double): Long = {
    if (baseWeight <= 0 || degradedMultiply <= 1 || normalizedLoadAvg >= 2.0)
      return 1L
    var l = normalizedLoadAvg
    if (l > degradedLoad) l *= degradedMultiply
    l = math.round(10 * l) / 10.0
    if (l == 0) return 2L * baseWeight
    val lg = math.log(l) * (1.0 / math.log(10.0))
    val w = baseWeight.toLong - (baseWeight.toDouble * lg).toLong
    if (w <= 0) 1L else w
  }

  /** Normalized 1-minute load: loadavg₁ / CPU count, from
    * `/proc/loadavg` (the reference reads sysinfo and counts
    * `/proc/cpuinfo` processors — `load_avg_linux.go`; declared
    * divergence: CPU count comes from the JVM runtime here).
    */
  def normalized(): Option[Double] =
    try {
      val s = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("/proc/loadavg")),
        "US-ASCII")
      val one = s.trim.split("\\s+")(0).toDouble
      val cpus = Runtime.getRuntime.availableProcessors().max(1)
      Some(one / cpus)
    } catch { case _: Throwable => None }
}
