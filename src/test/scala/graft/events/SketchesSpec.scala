package graft.events

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Differential tests of the CM / HLL sketches against a scratch
  * driver-side implementation sharing only the md5 hash definition.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val P = 2147483647L

  private def localHash(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % P
  }

  private def localCmsCells(key: String, depth: Int, width: Int): Seq[(Long, Long)] = {
    val h = localHash(key)
    (0 until depth).map(i => (i.toLong, ((h * (2 * i + 1) + 1000003L * i) % P) % width))
  }

  private def keysDf(keys: Seq[String]) = {
    import spark.implicits._
    keys.toDF("k")
  }

  test("baseHash Column == driver md5 hash, value for value") {
    import spark.implicits._
    val keys = Seq("0", "42", "999999937", "purchase", "click|13")
    val got = keys.toDF("k")
      .select(col("k"), Sketches.baseHash(col("k")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    keys.foreach(k => assert(got(k) == localHash(k), s"key $k"))
  }

  test("cmsSketch == brute-force counter grid; column sums = N per row") {
    val rnd = new scala.util.Random(60901)
    val keys = Seq.fill(800)("u" + rnd.nextInt(90))
    val (depth, width) = (4, 16)
    val got = Sketches.cmsSketch(keysDf(keys), col("k"), depth, width)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val want = keys.flatMap(localCmsCells(_, depth, width))
      .groupBy(identity).map { case (c, hits) => (c, hits.size.toLong) }
    assert(got == want)
    (0 until depth).foreach { i =>
      assert(got.collect { case ((r, _), n) if r == i => n }.sum == keys.size)
    }
  }

  test("cmsEstimates: est = min over rows of the grid; overcount >= 0 always") {
    val rnd = new scala.util.Random(31337)
    val keys = Seq.fill(600)("u" + (rnd.nextInt(40) * rnd.nextInt(40) % 70))
    val (depth, width) = (4, 8) // narrow: force real collisions
    val grid = keys.flatMap(localCmsCells(_, depth, width))
      .groupBy(identity).map { case (c, hits) => (c, hits.size.toLong) }
    val exact = keys.groupBy(identity).map { case (k, ks) => (k, ks.size.toLong) }
    val got = Sketches.cmsEstimates(keysDf(keys), col("k"), depth, width)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (k, (ex, est, over)) =>
      val want = localCmsCells(k, depth, width).map(grid).min
      assert(ex == exact(k) && est == want && over == est - ex && over >= 0, s"key $k")
    }
    assert(got.values.exists(_._3 > 0), "width 8 over 600 rows must collide somewhere")
  }

  test("hllRegisters == brute force; union of sketches = register-wise max") {
    import spark.implicits._
    val rnd = new scala.util.Random(2718)
    val rows = Seq.fill(700)(("g" + rnd.nextInt(3), "u" + rnd.nextInt(400)))
    def localRegs(rs: Seq[(String, String)]): Map[(String, Long), Long] =
      rs.map { case (g, k) =>
        val h = localHash(k)
        val rest = h >> 6
        val rho = if (rest == 0L) 26L
        else java.lang.Long.numberOfTrailingZeros(rest) + 1L
        ((g, h & 63L), rho)
      }.groupBy(_._1).map { case (gb, vs) => (gb, vs.map(_._2).max) }
    def sparkRegs(rs: Seq[(String, String)]): Map[(String, Long), Long] =
      Sketches.hllRegisters(rs.toDF("g0", "k"), col("g0"), col("k"))
        .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(sparkRegs(rows) == localRegs(rows))
    // mergeability: registers(A ++ B) == register-wise max of the parts
    val (a, b) = rows.splitAt(250)
    val merged = (sparkRegs(a).toSeq ++ sparkRegs(b).toSeq)
      .groupBy(_._1).map { case (gb, vs) => (gb, vs.map(_._2).max) }
    assert(merged == sparkRegs(rows))
  }

  test("bloom: no false negatives ever; probe == brute force; words pack the bit set") {
    import spark.implicits._
    val rnd = new scala.util.Random(1693)
    for (trial <- 1 to 3) {
      val (k, m) = (1 + rnd.nextInt(6), 64 << rnd.nextInt(3))
      val build = Seq.fill(60)("b" + rnd.nextInt(40)).distinct
      val absent = (1 to 50).map(i => "a" + i)
      val bitsSet = build.flatMap(localCmsCells(_, k, m)).map(_._2).distinct.toSet
      val bloom = Sketches.bloomBits(build.toDF("k"), col("k"), k, m)
      assert(bloom.collect().map(_.getLong(0)).toSet == bitsSet)
      val got = Sketches.bloomProbe(bloom, (build ++ absent).toDF("k"), col("k"), k, m)
        .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
      build.foreach(b => assert(got(b), s"trial $trial: false negative on $b"))
      absent.foreach { a =>
        val want = localCmsCells(a, k, m).map(_._2).forall(bitsSet)
        assert(got(a) == want, s"trial $trial: probe($a) != brute force")
      }
      // wire format: words reassemble to exactly the set positions
      val words = Sketches.bloomWords(bloom)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val unpacked = words.toSeq.flatMap { case (w, bits) =>
        (0 until 32).filter(b => (bits >> b & 1L) == 1L).map(b => w * 32 + b)
      }.toSet
      assert(unpacked == bitsSet.map(identity))
    }
  }

  test("hllDistinct: raw branch tracks true cardinality; small-range branch linear-counts") {
    import spark.implicits._
    // one group far above the 2.5m correction range, one tiny group
    val rows = (1 to 3000).map(i => ("big", "u" + i)) ++
      (1 to 4).map(i => ("tiny", "t" + i))
    val est = Sketches.hllDistinct(
        Sketches.hllRegisters(rows.toDF("g0", "k"), col("g0"), col("k")))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(math.abs(est("big") - 3000.0) / 3000.0 < 0.35, s"big=${est("big")}")
    // tiny group: every register distinct w.h.p. -> V = 64 - 4,
    // linear counting m*ln(m/V) exactly
    val regs = Sketches.hllRegisters(
        rows.filter(_._1 == "tiny").toDF("g0", "k"), col("g0"), col("k"))
      .collect()
    val v = 64 - regs.length
    val want = BigDecimal(64.0 * math.log(64.0 / v))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(est("tiny") == want)
  }
}
