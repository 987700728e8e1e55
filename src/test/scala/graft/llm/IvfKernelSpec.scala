package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The argmax-centroid kernel must be BIT-IDENTICAL to the
  * join+window assignment it replaces on the index-build path — same
  * cosine accumulation, same (sim DESC, centroid_id ASC) tie
  * convention, same NaN-above-everything ordering for degenerate
  * vectors. The kernel exists because the join+window form
  * materializes n·nlist rows (fatal at ×1000: 1.7e11 intermediate
  * rows); parity here is what lets AnnIndex swap it in under the
  * oracle-gated serve queries.
  */
class IvfKernelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("kernel == join+window on the fixture corpus (rounded sims included)") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val nlist = Similarity.ivfPlan(vecs.count())
    val cents = vecs.where(col("vec_id") < nlist)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    val a = pairs(Similarity.ivfAssign(vecs, cents)
      .select(col("vec_id"), col("centroid_id").cast("long"), col("sim")))
    val b = pairs(Similarity.ivfAssignKernel(vecs, cents))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("tie convention matches the window sort; zero vectors degrade, not throw") {
    import spark.implicits._
    val cents = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)), // duplicate centroid → tie
      (2L, Seq(0f, 1f)))
      .toDF("centroid_id", "centroid")
    val vecs = Seq((10L, Seq(0.9f, 0.1f))) // ties centroids 0 and 1 → 0
      .toDF("vec_id", "embedding")
    val a = pairs(Similarity.ivfAssign(vecs, cents)
      .select(col("vec_id"), col("centroid_id").cast("long"), col("sim")))
    val b = pairs(Similarity.ivfAssignKernel(vecs, cents))
    assert(a == b, s"window=$a kernel=$b")
    assert(b.head._2 == 0L, "tie must keep the lowest centroid id")

    // a zero vector makes the join+window form THROW under ANSI
    // (cosine divides by a zero norm); the kernel is a superset —
    // Java double arithmetic NaNs instead, and all-NaN keeps the
    // lowest centroid id (the order Spark's descending sort would use)
    val zero = Seq((11L, Seq(0f, 0f))).toDF("vec_id", "embedding")
    intercept[Exception] {
      Similarity.ivfAssign(zero, cents).collect()
    }
    val z = Similarity.ivfAssignKernel(zero, cents).collect()
    assert(z.length == 1 && z.head.getLong(1) == 0L)
  }

  test("guards: oversized centroid relation fails bounded, dim mismatch throws") {
    import spark.implicits._
    val cents = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)), (2L, Seq(1f, 1f)))
      .toDF("centroid_id", "centroid")
    val vecs = Seq((10L, Seq(0.9f, 0.1f))).toDF("vec_id", "embedding")
    // the guard fires from the LIMITed collect — the driver never
    // materializes more than maxCentroids + 1 rows
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfAssignKernel(vecs, cents, maxCentroids = 2)
    }
    assert(e.getMessage.contains("exceeds the 2 guard"))

    // a vector whose width differs from the centroids must fail fast,
    // not silently score a truncated dot product
    val wide = Seq((11L, Seq(0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      Similarity.ivfAssignKernel(wide, cents).collect()
    }
    assert(e2.getMessage != null)
  }

  test("trained (double) centroids assign identically through the kernel") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kmeansTrain(vecs, k = 4, iters = 2)._2
    val a = pairs(Similarity.ivfAssign(vecs, cents)
      .select(col("vec_id"), col("centroid_id").cast("long"), col("sim")))
    val b = pairs(Similarity.ivfAssignKernel(vecs, cents))
    assert(a == b)
  }
}
