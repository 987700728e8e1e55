package graft.tools

import graft.SparkTestBase

/** Census mode: executed-plan operator counts for every registered
  * query at sf0.001 → markdown table rows on stdout.
  *
  * `Test/runMain graft.tools.DriveScratch sq8` switches to the
  * e_sq8_search phase-timing drive (r9→r10 regression triage).
  */
object DriveScratch {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("sq8")) { sq8Drive(); return }
    if (args.headOption.contains("groupleft")) { groupLeftDrive(args.drop(1)); return }
    val spark = SparkTestBase.spark
    val sfDir = "/root/testdata/sf0.001"

    // memoized-table derivation census first: per-query rows below
    // stop at the memoized LogicalRDD, so the cost of deriving each
    // graphite side table is reported here ONCE (it is paid once per
    // session) instead of being invisible.
    spark.conf.set(graft.engine.GraphiteTables.DisableMemoKey, "true")
    val memoTables = Seq(
      "memo:index" -> (() => graft.engine.GraphiteTables.index(spark, sfDir)),
      "memo:tags" -> (() => graft.engine.GraphiteTables.tags(spark, sfDir)),
      "memo:points" -> (() => graft.engine.GraphiteTables.points(spark, sfDir)),
      "memo:pointsTagged" -> (() => graft.engine.GraphiteTables.pointsTagged(spark, sfDir)))
    for ((name, build) <- memoTables) {
      try {
        val df = build()
        df.write.mode("overwrite").format("noop").save()
        val p = df.queryExecution.executedPlan.toString
        def n(pat: String) = pat.r.findAllIn(p).length
        println(s"CENSUS | $name | ${n("FileScan parquet")} | ${n("Exchange")} | " +
          s"${n("SortMergeJoin") + n("ShuffledHashJoin")} | ${n("BroadcastHashJoin")} | " +
          s"${n("BroadcastNestedLoopJoin")} | ${n("Window")} | ${n("CartesianProduct")} |")
      } catch {
        case e: Throwable =>
          println(s"CENSUS-ERR $name ${Option(e.getMessage).getOrElse("?").take(120)}")
      }
    }
    spark.conf.unset(graft.engine.GraphiteTables.DisableMemoKey)

    // optional arg: comma-separated query-name filter (local iteration)
    val only: Option[Set[String]] =
      args.headOption.map(_.split(',').toSet)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    for (name <- names) {
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.write.mode("overwrite").format("noop").save()
        val p = df.queryExecution.executedPlan.toString
        def n(pat: String) = pat.r.findAllIn(p).length
        val scans = n("FileScan parquet")
        val ex = n("Exchange")
        val smj = n("SortMergeJoin") + n("ShuffledHashJoin")
        val bhj = n("BroadcastHashJoin")
        val bnlj = n("BroadcastNestedLoopJoin")
        val win = n("Window")
        val cart = n("CartesianProduct")
        println(s"CENSUS | $name | $scans | $ex | $smj | $bhj | $bnlj | $win | $cart |")
      } catch {
        case e: Throwable =>
          println(s"CENSUS-ERR $name ${Option(e.getMessage).getOrElse("?").take(120)}")
      }
    }
    spark.stop()
  }

  /** Stage-level triage of p_query_groupleft at a scaled dir: per-stage
    * wall time + task count + shuffle volumes, plus the formatted plan.
    */
  private def groupLeftDrive(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/x100")
    val threads = args.lift(1).getOrElse("32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        stages.add(f"GLSTAGE ${si.stageId}%4d ${ms.getOrElse(-1L)}%7d ms " +
          f"tasks=${si.numTasks}%3d in=${si.taskMetrics.inputMetrics.bytesRead / 1048576}%5d MB " +
          f"sh-r=${si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1048576}%5d MB " +
          f"sh-w=${si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1048576}%5d MB " +
          f"spill=${si.taskMetrics.diskBytesSpilled / 1048576}%5d MB | ${si.name.take(60)}")
      }
    })
    try {
      graft.engine.GraphiteTables.index(spark, dir).count()
      graft.engine.GraphiteTables.tags(spark, dir).count()
      graft.engine.GraphiteTables.points(spark, dir).count()
      graft.engine.GraphiteTables.pointsTagged(spark, dir).count()
    } catch { case _: Throwable => }
    stages.clear()
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries("p_query_groupleft")(spark, dir)
    df.write.mode("overwrite").format("noop").save()
    println(f"GLTOTAL ${(System.nanoTime() - t0) / 1e9}%.1f s")
    Thread.sleep(2000) // let listener drain
    stages.forEach(println)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(8000))
    spark.stop()
  }

  private def sq8Drive(): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.llm.Similarity
    val spark = SparkTestBase.spark
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"SQ8TIME $label $s%.3f s"); s
    }
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"SQ8ROWS ${vecs.count()}")
    // OLD shape: driver-collected train stats + literal-array encode
    def oldSearch(): Unit = {
      val dim = 64; val k = 5
      val (mins, scales) = Similarity.sq8Train(vecs, dim)
      val mn = array(mins.map(lit): _*)
      val sc = array(scales.map(lit): _*)
      val enc = Similarity.sq8Encode(vecs, mins, scales)
      val deq = zip_with(col("codes"), sequence(lit(1), lit(dim)),
        (c, i) => element_at(mn, i) + c.cast("double") / 255.0 * element_at(sc, i))
      val q = vecs.where(col("vec_id") < 5)
        .select(col("vec_id").cast("long").as("query_id"), col("embedding").as("q_emb"))
      val scored = enc.join(broadcast(q), col("query_id") =!= col("vid"))
        .withColumn("dist", Similarity.l2sq(deq, col("q_emb")))
      val w = Window.partitionBy("query_id").orderBy(col("dist").asc, col("vid").asc)
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("vid").as("neighbor_id"),
          round(col("dist"), 4).as("dist"))
        .write.mode("overwrite").format("noop").save()
    }
    def newSearch(): Unit =
      Similarity.sq8Search(vecs, vecs.where(col("vec_id") < 5), k = 5, dim = 64)
        .write.mode("overwrite").format("noop").save()
    // interleave old/new, report per-variant min — same JVM, same weather
    var oldMin = Double.MaxValue; var newMin = Double.MaxValue
    for (round <- 1 to 4) {
      oldMin = math.min(oldMin, t(s"r$round-old")(oldSearch()))
      newMin = math.min(newMin, t(s"r$round-new")(newSearch()))
    }
    println(f"SQ8MIN old $oldMin%.3f new $newMin%.3f")
    spark.stop()
  }
}
