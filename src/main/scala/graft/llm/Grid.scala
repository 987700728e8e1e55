package graft.llm

/** THE determinism grid: floor onto multiples of 2^-20. Every trainer
  * that feeds a distributed aggregate forward across iterations
  * (k-means means, PCA iterates, streaming twins), every quantized
  * log-prob (unigram DP), and every quantized transcendental term
  * (image entropy) snaps to this ONE grid so that (a) partial-sum
  * ulp noise (~1e-13 relative) collapses — results are bit-identical
  * on any partitioning — and (b) the DuckDB oracle twins reproduce
  * the exact doubles with `floor(x * 1048576.0) / 1048576.0`. Grid
  * values of bounded magnitude also SUM exactly in any order (they
  * are small-integer multiples of 2^-20 — the `m_img_entropy` /
  * `keywordTopK` device). Changing the grid anywhere means changing
  * it everywhere, including every SQL twin — which is why it lives
  * in one place.
  */
object Grid {
  def q20(x: Double): Double = math.floor(x * 1048576.0) / 1048576.0
}
