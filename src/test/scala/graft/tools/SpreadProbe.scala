package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-session A/B for the adaptive scan-spread rule
  * ([[graft.Tuning.spreadTinyInput]]): for each registered query that
  * sits on a spread-instrumented path, run base (spread disabled via
  * the session conf) and spread (enabled) INTERLEAVED — base, spread,
  * base, spread — and report min-of-2 per arm. One session, so host
  * weather, JIT and codec warmup hit both arms equally; the two-
  * session form of this comparison disagreed with itself by 2–4× per
  * query in both directions.
  *
  * `Test/runMain graft.tools.SpreadProbe q1,q2,...` (default: the 29
  * affected queries).
  */
object SpreadProbe {
  // NOTE (round-17, from round-16 ADVICE): d_split_media,
  // d_split_media_linear and m_afp_dedup are NOT in this list —
  // their entries are wrapped in SparkEntry.noSpread, which forces
  // the spread off during construction in BOTH probe arms, so their
  // base/spread ratio reads ~1.0 regardless of the spread's real
  // effect. Measure those by editing the entry, not by this probe.
  val affected: Seq[String] = Seq(
    "d_bpe_encode", "d_simhash", "d_simhash_pairs", "d_simhash_recall",
    "d_simhash_recall_banded",
    "d_unigram_encode", "d_wordpiece_encode", "m_afp",
    "m_afp_pairs", "m_avi_frames", "m_avi_motion", "m_avi_motion_banded",
    "m_dhash", "m_dhash_dedup", "m_dhash_pairs", "m_dhash_wide",
    "m_dhash_wide_pairs", "m_features", "m_frames", "m_img_entropy",
    "m_png_features", "m_png_resize", "m_resize", "m_vad_segments",
    "m_wav_features", "q_topk")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-spread-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tuning.configureShuffle(spark, Seq(sfDir), cpus.toInt)
    try {
      val n = math.max(cpus.toInt, 1)
      spark.sparkContext.parallelize(0 until 4 * n, 4 * n)
        .foreach(_ => graft.llm.Multimodal.warmCodecs())
    } catch { case _: Throwable => }

    val names = args.headOption.map(_.split(',').toSeq).getOrElse(affected)
      .filter(graft.SparkEntry.queries.contains)

    def once(name: String, enabled: Boolean): Double = {
      spark.conf.set(graft.Tuning.SpreadEnabledKey, enabled.toString)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (name <- names) {
      try {
        val b1 = once(name, enabled = false)
        val s1 = once(name, enabled = true)
        val b2 = once(name, enabled = false)
        val s2 = once(name, enabled = true)
        val b = math.min(b1, b2); val s = math.min(s1, s2)
        println(f"SPREADAB | $name | $b%.3f | $s%.3f | ${s / b}%.2f |")
      } catch {
        case e: Throwable =>
          println(s"SPREADAB-ERR $name ${Option(e.getMessage).getOrElse("?").take(160)}")
      } finally spark.conf.unset(graft.Tuning.SpreadEnabledKey)
    }
    spark.stop()
  }
}
