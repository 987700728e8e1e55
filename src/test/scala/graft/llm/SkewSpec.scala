package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Hot-key stress for the dedup operators — the generated fixtures
  * concentrate exactly the skew that kills naive plans at corpus
  * scale (a boilerplate shingle shared by 30% of documents; an LSH
  * band bucket holding 50% of all signatures), then pin BOTH the
  * result and the plan shape. The plan assertions are the 100 TB
  * design claims as regressing tests: shingle frequency must come
  * from hash aggregates (map-side partials + AQE-splittable
  * join-back), never a `Window.partitionBy(h)` that serializes the
  * hot key into one task; pair generation must stay bucket-keyed
  * (equi-join on the band), never a cartesian.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("duplicateSpans under a 30%-hot shingle: hash-agg plan, correct counts") {
    import spark.implicits._
    val n = 5000
    val hot = 1500 // 30% of docs share one boilerplate 5-shingle
    val docs = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") < hot,
        concat(lit("alpha bravo charlie delta echo "),
          concat(lit("u"), col("id")), lit(" "),
          concat(lit("v"), col("id"))))
        .otherwise(
          // 6 unique words → 2 unique shingles per doc, nothing shared
          concat_ws(" ", Seq("a", "b", "c", "d", "e", "f").map(p =>
            concat(lit(p), col("id"))): _*))
        .as("text"))

    val out = Dedup.duplicateSpans(docs, col("text"), col("doc_id"))

    // plan shape: no window over the content-hash key, hash aggregates
    // only (partial aggregation collapses the hot key map-side)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "Window over content-hash key under skew")
    assert(plan.contains("HashAggregate"), "expected hash aggregates")

    val t0 = System.nanoTime()
    val rows = out.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // generous wall bound: the point is that the hot key must not
    // serialize the stage (the pre-fix window shape degrades linearly
    // in hot-key occurrences on ONE task)
    assert(secs < 120.0, f"duplicateSpans took $secs%.1f s under skew")

    val byId = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId.size == n)
    // hot docs: 7 words → 3 shingles, exactly one (the boilerplate
    // prefix) duplicated elsewhere
    assert((0L until hot.toLong).forall(i => byId(i) == ((3L, 1L))),
      s"hot docs miscounted: ${byId(0L)}")
    // cold docs: 2 unique shingles, zero duplicated
    assert((hot.toLong until n.toLong).forall(i => byId(i) == ((2L, 0L))),
      s"cold docs miscounted: ${byId(hot.toLong)}")
  }

  test("dropBoilerplateLines under a 40%-hot footer line: hash-agg plan, exact removal") {
    import spark.implicits._
    val n = 5000
    val hot = 2000 // 40% of docs carry the same footer line
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(
        concat(lit("unique"), col("id")),
        when(col("id") < hot, lit("\nall rights reserved")).otherwise(lit("")))
        .as("text"))

    val out = Dedup.dropBoilerplateLines(docs, col("text"), col("doc_id"))

    // the d_dup_spans rule at line granularity: the 2000-doc footer
    // must fold through hash aggregates (map-side partials), never a
    // line-keyed window that serializes it into one task
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "Window over line key under skew")
    assert(plan.contains("HashAggregate"), "expected hash aggregates")

    val t0 = System.nanoTime()
    val rows = out.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 120.0, f"dropBoilerplateLines took $secs%.1f s under skew")

    val byId = rows.map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(byId.size == n)
    assert((0L until hot.toLong).forall(i =>
      byId(i) == ((2L, 1L, s"unique$i"))), s"hot docs wrong: ${byId(0L)}")
    assert((hot.toLong until n.toLong).forall(i =>
      byId(i) == ((1L, 0L, s"unique$i"))), s"cold docs wrong: ${byId(hot.toLong)}")
  }

  test("minhash near-dups under a 50%-hot band bucket: bucket-keyed plan, full clique") {
    import spark.implicits._
    val n = 1200
    val dup = 600 // half the corpus shares one signature → one hot bucket
    val docs = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") < dup,
        lit("the same boilerplate text repeated across many documents verbatim"))
        .otherwise(concat_ws(" ", Seq("p", "q", "r", "s", "t").map(p =>
          concat(lit(p), col("id"))): _*))
        .as("text"))

    val pairs = Dedup.minhashNearDups(
      docs, col("text"), col("doc_id"), shingleWidth = 3, bands = 4, rows = 2,
      threshold = 0.6)

    // plan shape: candidate generation is an equi-join on the band key
    // — a skewed bucket is an AQE skew-join problem, never a cartesian
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian under banded skew")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested loop under banded skew")

    val t0 = System.nanoTime()
    val got = pairs.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 180.0, f"minhashNearDups took $secs%.1f s under skew")

    // identical docs form the complete clique at jaccard 1.0; the
    // unique half contributes nothing
    assert(got.length == dup * (dup - 1) / 2, s"got ${got.length} pairs")
    assert(got.forall(_.getDouble(2) == 1.0))
    assert(got.forall(r => r.getLong(0) < dup && r.getLong(1) < dup))
  }

  test("invertedIndex under a 100%-hot stop-word: salted aggregate, exact lowest cap") {
    import spark.implicits._
    val n = 20000
    // 'the' appears in EVERY doc — the textbook posting-list hot key;
    // each doc also carries a unique token
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("the u"), col("id")).as("text"))

    val out = TextStats.invertedIndex(docs, col("text"), col("doc_id"),
      cap = 8, salts = 16)
    // plan shape: two aggregate levels, never a window or a
    // term-keyed row_number that serializes the stop-word
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "window over the term key under skew")
    assert(!plan.contains("CartesianProduct"), "cartesian in invertedIndex")

    val t0 = System.nanoTime()
    val hot = out.where(col("token") === "the").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, f"invertedIndex took $secs%.1f s under skew")
    assert(hot.length == 1)
    assert(hot.head.getAs[Long]("df") == n.toLong)
    assert(hot.head.getSeq[Long](hot.head.fieldIndex("postings")).toList ==
      (0L until 8L).toList)
  }

  test("rankExactBy under a 90%-hot group: ranks exact, no group-windowed corpus") {
    import graft.events.Rfm
    val n = 100000
    val df = spark.range(n.toLong).select(
      when(col("id") % 10 < 9, lit("en")).otherwise(lit("de")).as("g"),
      (col("id") * 37 % 1000).cast("double").as("v"),
      col("id"))
    val out = Rfm.rankExactBy(df, Seq("g"), Seq(col("v"), col("id")),
      buckets = 16)
    // the naive shape would window the 100k-row relation PARTITION BY
    // g ORDER BY v — spec would print the value right after the group
    val plan = out.queryExecution.executedPlan.toString
    assert(!"windowspecdefinition\\(g#\\d+, v#".r.findFirstIn(plan).isDefined,
      "value-ordered group window over the relation under skew")

    val t0 = System.nanoTime()
    val stats = out.groupBy("g").agg(
      count(lit(1)).as("rows"), countDistinct(col("rank")).as("dranks"),
      min("rank").as("lo"), max("rank").as("hi"), max("total").as("total"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, f"rankExactBy took $secs%.1f s under skew")
    // exact dense 1..count rank per group, totals right
    assert(stats("en") == ((90000L, 90000L, 1L, 90000L, 90000L)))
    assert(stats("de") == ((10000L, 10000L, 1L, 10000L, 10000L)))
  }

  test("semanticDedup under one 60%-hot cluster: cluster-keyed plan, keep-lowest") {
    import spark.implicits._
    val n = 2000
    val hot = 1200 // 60% of vectors collapse into cluster 0
    // two near-dup piles in different cells: hot (60%) around axis 0,
    // the rest around axis 2 — every vector inside a pile is a
    // near-dup of every other, so keep-lowest leaves exactly one per
    // pile and the pair join handles Σ|cluster|² ≈ 1.0 M candidates
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      when(col("id") < hot,
        array(lit(1.0), col("id").cast("double") * 1e-7, lit(0.0), lit(0.0)))
        .otherwise(array(lit(0.0), lit(0.0), lit(1.0),
          col("id").cast("double") * 1e-7))
        .as("embedding"))
    val cents = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0, 0.0)),
      (2L, Seq(0.0, 0.0, 1.0, 0.0)), (3L, Seq(0.0, 0.0, 0.0, 1.0)))
      .toDF("centroid_id", "centroid")

    val out = Similarity.semanticDedup(vecs, cents, threshold = 0.95)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian under cluster skew")

    val t0 = System.nanoTime()
    val rows = out.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // Σ|cluster|² pairs (≈ 0.7 M cosines here) must stream through the
    // cluster-key equi-join, not serialize or square the corpus
    assert(secs < 120.0, f"semanticDedup took $secs%.1f s under skew")

    val ids = rows.map(_.getLong(0)).toSet
    // each pile keeps exactly its lowest id — cluster-scoped, so the
    // two piles never dedup against each other
    assert(ids == Set(0L, hot.toLong), s"survivors: $ids")
  }
}
