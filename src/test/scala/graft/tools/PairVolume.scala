package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement harness for SCALE_NOTES finding 4's follow-up:
  * does the banded-pair OUTPUT (not just the candidate set) grow
  * quadratically under the ×R disjoint-replica perturbation? Reports,
  * per factor: n (fps), distinct fps, banded candidate volume, and
  * verified pairs at dist ≤ 20 / ≤ 10 / ≤ 3 over the 120-bit wide
  * fingerprint.
  */
object PairVolume {
  def main(args: Array[String]): Unit = {
    val factors = args.headOption.map(_.split(',').map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 10, 100))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (r <- factors) {
      val dir = s"target/scale/x$r"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val fps = graft.llm.Multimodal.dhashWide(
        graft.llm.Multimodal.withPngPayload(docs)).cache()
      val n = fps.count()
      val nDistinct = fps.select("fp_lo", "fp_hi").distinct().count()
      val mask = (1L << 30) - 1L
      val slices = Seq(
        struct(lit(0).as("b"), col("fp_lo").bitwiseAND(lit(mask)).as("v")),
        struct(lit(1).as("b"), shiftright(col("fp_lo"), 30).as("v")),
        struct(lit(2).as("b"), col("fp_hi").bitwiseAND(lit(mask)).as("v")),
        struct(lit(3).as("b"), shiftright(col("fp_hi"), 30).as("v")))
      val banded = fps.select(col("doc_id"),
        explode(array(slices: _*)).as("s"))
        .select(col("doc_id"), col("s.b").as("b"), col("s.v").as("v"))
      // candidate volume = Σ_bucket occ·(occ-1)/2 (what the join feeds
      // to the verifier, pre-distinct)
      val cand = banded.groupBy("b", "v").count()
        .agg(sum(col("count") * (col("count") - 1) / 2)).head.getDouble(0)
      // one banded join; the smaller radii are subsets of the dist≤20
      // output, so they count from the cached pair list instead of
      // re-running the quadratic-candidate join
      val pairs20 = graft.llm.Multimodal.dhashPairsWide(fps, maxDist = 20).cache()
      val v20 = pairs20.count()
      val v10 = pairs20.where(col("dist") <= 10).count()
      val v3 = pairs20.where(col("dist") <= 3).count()
      println(f"PAIRVOL | x$r | n=$n | distinct=$nDistinct | cand=${cand.toLong} | v20=$v20 | v10=$v10 | v3=$v3")
      // corpus-adaptive banding (Multimodal.dhashPlan): candidate
      // volume under the bands the production dedup now picks by
      // default — the finding-4 rule verified end to end
      val autoBands = graft.llm.Multimodal.dhashPlan(n, 120)
      val candAuto = graft.llm.Multimodal.wideBands(fps, autoBands)
        .groupBy("b", "v").count()
        .agg(sum(col("count") * (col("count") - 1) / 2)).head.getDouble(0)
      println(f"PAIRVOL-AUTO | x$r | n=$n | bands=$autoBands | cand=${candAuto.toLong} | cand_per_doc=${candAuto / n}%.2f")
      pairs20.unpersist()
      fps.unpersist()
    }
    spark.stop()
  }
}
