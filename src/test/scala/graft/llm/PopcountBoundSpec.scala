package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-17: the popcount necessary condition for Hamming proximity
  * (`|popcount(a) − popcount(b)| <= hamming(a, b)`), evaluated before
  * the XOR-popcount / candidate distinct in the simhash generators.
  * Pins (1) the math — the bound never rejects a pair the exact
  * filter keeps — and (2) end-to-end result identity of the banded
  * and prefix generators against a bound-free reference.
  */
class PopcountBoundSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("popcount bound is a necessary condition for hamming <= d (property, 5000 cases)") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 5000) {
      val a = rnd.nextLong() & 0xffffffffL
      // flip up to 12 random bits of a 32-bit fp
      var b = a
      for (_ <- 0 until rnd.nextInt(13)) b = b ^ (1L << rnd.nextInt(32))
      val hamming = java.lang.Long.bitCount(a ^ b)
      val pcGap = math.abs(java.lang.Long.bitCount(a) - java.lang.Long.bitCount(b))
      assert(pcGap <= hamming,
        s"bound violated: a=$a b=$b pcGap=$pcGap hamming=$hamming")
    }
  }

  test("banded + prefix near-dup pairs identical to the bound-free reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val docs = (1L to 300L).map { id =>
      val words = (0 until 12).map(i => s"w${rnd.nextInt(40)}_$i").mkString(" ")
      (id, words)
    }.toDF("doc_id", "text")

    // reference: exact pairs from the fingerprints with NO bound and
    // NO early filter — the pre-round-17 semantics spelled directly
    val fp = Dedup.simhashDF(docs, col("text"), col("doc_id"))
    val maxD = 10
    def reference(prefixBits: Int): Set[(Long, Long, Long)] = {
      val f = fp.withColumn("bucket", shiftright(col("fp"), 32 - prefixBits))
      f.as("a").join(f.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          Dedup.hamming(col("a.fp"), col("b.fp")).as("d"))
        .where(col("d") <= maxD)
        .as[(Long, Long, Long)].collect().toSet
    }
    val got = Dedup.simhashNearDups(docs, col("text"), col("doc_id"),
        prefixBits = 8, maxDistance = maxD)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == reference(8), "prefix generator diverged from bound-free reference")

    def referenceBanded(bands: Int): Set[(Long, Long, Long)] = {
      val w = 32 / bands
      val banded = fp.select(col("id"), col("fp"),
          explode(array((0 until bands).map(b =>
            struct(lit(b).as("band"),
              shiftright(col("fp"), b * w).bitwiseAND(lit((1L << w) - 1)).as("v"))): _*))
            .as("bv"))
        .select(col("id"), col("fp"), col("bv.band"), col("bv.v"))
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          Dedup.hamming(col("a.fp"), col("b.fp")).as("dist"))
        .distinct()
        .where(col("dist") <= maxD)
        .as[(Long, Long, Long)].collect().toSet
    }
    val gotBanded = Dedup.simhashNearDupsBanded(docs, col("text"), col("doc_id"),
        bands = 4, maxDistance = maxD)
      .as[(Long, Long, Long)].collect().toSet
    assert(gotBanded == referenceBanded(4),
      "banded generator diverged from bound-free reference")
  }
}
