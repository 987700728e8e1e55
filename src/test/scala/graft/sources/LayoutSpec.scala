package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.ZOrderKernel

/** Z-order layout: the Morton code interleaves correctly, and a
  * z-clustered write prunes files for point predicates on EITHER
  * dimension, where the lexicographic layout prunes only its leading
  * column.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("morton code: known interleavings, locality ordering") {
    assert(ZOrderKernel.interleave(0L, 0L, 8) == 0L)
    assert(ZOrderKernel.interleave(1L, 0L, 8) == 1L)
    assert(ZOrderKernel.interleave(0L, 1L, 8) == 2L)
    assert(ZOrderKernel.interleave(3L, 3L, 8) == 15L)
    assert(ZOrderKernel.interleave(5L, 3L, 8) == 27L) // 101 ⋈ 011 = 011011
  }

  test("z-clustered files prune on both dimensions; linear sort only on its leading one") {
    import spark.implicits._
    val n = 1 << 14
    // two independent uniform dimensions
    val df = spark.range(n).select(
      (col("id") * 2654435761L % n).as("user"),
      (col("id") * 40503L % n).as("t"))
    val zdir = "target/layout-z"
    val ldir = "target/layout-linear"
    Layout.writeZOrdered(df, zdir, col("user"), col("t"), numFiles = 16, bits = 14)
    df.repartitionByRange(16, col("t")).sortWithinPartitions("t")
      .write.mode("overwrite").parquet(ldir)

    def filesTouched(dir: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(dir).where(cond)
        .select(input_file_name()).distinct().count()

    val userCond = col("user") < n / 16
    val tCond = col("t") < n / 16
    val zUser = filesTouched(zdir, userCond)
    val lUser = filesTouched(ldir, userCond)
    val zT = filesTouched(zdir, tCond)

    // linear t-sorted layout scatters a user-range over ~all files;
    // the z layout confines each dimension to ~sqrt of them
    assert(zUser < lUser,
      s"z layout should touch fewer files for the non-leading dim: z=$zUser linear=$lUser")
    assert(zT <= 8, s"z layout lost t locality: $zT of 16 files")
  }
}
