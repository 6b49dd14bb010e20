package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measurement harness for optimization rounds (guide §1): per query,
  * one warm-up rep then a timed rep with a listener counting the
  * jobs/stages/tasks the rep schedules — at bench scale the job count
  * IS the cost model (sf0.1 data is ~17 MB; wall-clock is scheduling,
  * planning and commit I/O, all proportional to actions run). Also
  * dumps `.explain("formatted")` for each profiled query into
  * `plans/<tag>/<query>_<suffix>.txt` so plan-shape claims
  * (Exchange count, join strategy, PushedFilters) are auditable
  * without running Spark.
  *
  * Usage: runMain graft.Profile <sfDir> <comma-names|all> [planSuffix]
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PLAN_DIR
  * (default plans/r20; empty string disables plan dumps). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1)
    val suffix = if (args.length > 2) args(2) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val planDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r20")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected = SparkEntry.select(if (names == "all") None else Some(names))

    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val stages = new java.util.concurrent.atomic.AtomicLong()
    val tasks = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        { tasks.incrementAndGet(); () }
    })

    // same warmups as Bench so first-rep costs land where Bench puts them
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => Tables.load(spark, sfDir, t).count())
    def anySelected(p: String => Boolean): Boolean = selected.keys.exists(p)
    if (anySelected(k => k.startsWith("ft_") || k == "idx_segment_ft" ||
        k == "txt_vocab")) {
      QueryCaches.postings(spark, sfDir).count()
      QueryCaches.positional(spark, sfDir).count()
      QueryCaches.dictionary(spark, sfDir).count()
      QueryCaches.corpusSize(spark, sfDir)
      QueryCaches.doclens(spark, sfDir).count()
      QueryCaches.avgDocLen(spark, sfDir)
      QueryCaches.blockmax(spark, sfDir).count()
      ()
    }
    if (anySelected(_.startsWith("idx_bitmap")))
      Seq("o_orderstatus", "o_orderpriority")
        .foreach(c => QueryCaches.ordersBitmap(spark, sfDir, c).count())
    if (anySelected(k => k.startsWith("sim_") ||
        Set("dd_minhash_lsh", "dd_keep_list", "dd_embedding").contains(k)))
      dedup.DedupQueries.warmIndexes(spark, sfDir)
    if (anySelected(k => k == "kv_ms_get" || k == "idx_ms_lookup" ||
        k == "kv_ms_scan" || k == "kv_time_travel"))
      kv.KvQueries.warmMsGet(spark, sfDir)

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(f"${"query"}%-24s warm_s  timed_s  jobs  stages  tasks")
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"$name warmup")
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val warm = (System.nanoTime() - t0) / 1e9
      if (planDir.nonEmpty) {
        val p = java.nio.file.Paths.get(planDir, s"${name}_$suffix.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p,
          fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      }
      jobs.set(0); stages.set(0); tasks.set(0)
      spark.sparkContext.setJobDescription(s"$name timed")
      val t1 = System.nanoTime()
      fn(spark, sfDir).count()
      val timed = (System.nanoTime() - t1) / 1e9
      Thread.sleep(50) // let listener events drain
      println(f"$name%-24s ${fmt(warm)}%7s ${fmt(timed)}%8s ${jobs.get()}%5d ${stages.get()}%7d ${tasks.get()}%6d")
    }
    spark.stop()
  }
}
