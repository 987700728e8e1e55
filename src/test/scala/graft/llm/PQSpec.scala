package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Product-quantization properties on the sf0.001 embeddings: the
  * exactness limit (codebooks spanning every vector make ADC = exact
  * L2) and Lloyd-iteration distortion descent.
  */
class PQSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .where(col("vec_id") < 20)

  test("exactness limit: codebooks covering every vector make ADC exact L2") {
    // k = corpus size + zero Lloyd iterations → each subvector's
    // nearest codebook entry is itself, codes reconstruct the vector,
    // and the asymmetric distance IS the true squared L2
    val books = Similarity.pqTrain(vecs, m = 8, k = 20, iters = 0, dim = 64)
    val codes = Similarity.pqEncode(vecs, books, m = 8, dim = 64)
    val queries = vecs.where(col("vec_id") < 3)
    val adc = Similarity.pqSearch(codes, books, queries, k = 5, m = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    // brute-force L2 reference over the same 20 vectors
    val a = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val b = vecs.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2").asc, col("neighbor_id").asc)
    val brute = a.join(b).where(col("query_id") =!= col("neighbor_id"))
      .withColumn("d2", Similarity.l2sq(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(adc == brute)
  }

  test("Lloyd iterations do not increase quantization distortion") {
    def distortion(iters: Int): Double = {
      val books = Similarity.pqTrain(vecs, m = 8, k = 4, iters = iters, dim = 64)
      val subs = vecs.select(col("vec_id").cast("long").as("vid"),
          explode(transform(sequence(lit(0), lit(7)), s =>
            struct(s.as("sub"), slice(col("embedding"), s * 8 + 1, lit(8)).as("semb"))))
            .as("x"))
        .select(col("vid"), col("x.sub").as("sub"), col("x.semb").as("semb"))
      subs.join(broadcast(books), Seq("sub"))
        .withColumn("d2", Similarity.l2sq(col("semb"), col("centroid")))
        .groupBy("vid", "sub").agg(min("d2").as("d2"))
        .agg(sum("d2")).head().getDouble(0)
    }
    val d0 = distortion(0)
    val d2 = distortion(2)
    assert(d2 <= d0 + 1e-9, s"distortion rose: $d0 -> $d2")
    // and the trained codebooks still have the full shape
    val books = Similarity.pqTrain(vecs, m = 8, k = 4, iters = 2, dim = 64)
      .collect()
    assert(books.nonEmpty && books.forall(_.getSeq[Double](2).size == 8))
  }

  test("init seeds a full k-entry codebook on sparse, non-zero-based ids") {
    // ids 1000, 1007, 1014, … — a literal `vid < k` predicate would
    // select NOTHING here; rank-based init must still pick the k
    // lowest ids and yield k entries in every subspace
    val sparse = vecs.withColumn("vec_id", col("vec_id") * 7 + 1000)
    val books = Similarity.pqTrain(sparse, m = 8, k = 4, iters = 0, dim = 64)
    val perSub = books.groupBy("sub").count().collect()
    assert(perSub.length == 8 && perSub.forall(_.getLong(1) == 4L),
      s"expected 4 entries in each of 8 subspaces: ${perSub.mkString(",")}")
    // and the seeds are exactly the 4 lowest ids
    val ids = books.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1000L, 1007L, 1014L, 1021L), ids.toString)
  }

  test("ivfPqSearch with all cells probed equals the corpus-wide ADC pass") {
    // nprobe = #centroids → the candidate set is the whole corpus
    // minus self, so IVF-PQ must reproduce pqSearch exactly; any
    // smaller nprobe only drops candidates, never re-scores them
    val centroids = vecs.where(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    val books = Similarity.pqTrain(vecs, m = 8, k = 8, iters = 0, dim = 64)
    val codes = Similarity.pqEncode(vecs, books, m = 8, dim = 64)
    val queries = vecs.where(col("vec_id") < 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "d2")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
    val full = rows(Similarity.pqSearch(codes, books, queries,
      k = 5, m = 8, dim = 64))
    val ivfpq = rows(Similarity.ivfPqSearch(vecs, centroids, books, queries,
      k = 5, m = 8, dim = 64, nprobe = 4))
    assert(ivfpq == full)
    // tighter probing drops candidates but never re-scores them:
    // every (query, neighbor, d2) it returns appears verbatim in the
    // corpus-wide ADC ranking
    val allAdc = rows(Similarity.pqSearch(codes, books, queries,
      k = 20, m = 8, dim = 64)).map(t => (t._1, t._3, t._4))
    val narrow = rows(Similarity.ivfPqSearch(vecs, centroids, books, queries,
      k = 5, m = 8, dim = 64, nprobe = 1))
    assert(narrow.nonEmpty)
    assert(narrow.forall(t => allAdc.contains((t._1, t._3, t._4))))
  }
}
