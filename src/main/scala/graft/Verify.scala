package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter for targeted
    // re-checks (full runs omit it; the driver always does). Unknown
    // names and empty filters fail loudly inside SparkEntry.select —
    // either would let a targeted re-check "pass" vacuously.
    val selected = SparkEntry.select(args.drop(2).headOption)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fresh output dir: a stale result from a previous run must never
    // mask a now-failing query. The wipe only ever touches a dir that
    // is provably a PREVIOUS VERIFY OUTPUT (it carries oracle_sql.json)
    // or is empty/absent — swapped CLI args once pointed this delete at
    // a testdata directory and destroyed it; refusing loudly beats
    // recovering from a deterministic-regeneration script.
    val out = Paths.get(outDir)
    if (Files.exists(out)) {
      require(Files.isDirectory(out),
        s"refusing to wipe $outDir: it is a regular file, not a " +
          "Verify output directory — are the <sfDir> <outDir> args swapped?")
      val prior = Files.exists(out.resolve("oracle_sql.json"))
      val empty = {
        val s = Files.list(out)
        try !s.iterator().hasNext finally s.close()
      }
      require(prior || empty,
        s"refusing to wipe $outDir: it is neither empty nor a previous " +
          "Verify output (no oracle_sql.json) — are the <sfDir> <outDir> " +
          "args swapped?")
      Files.walk(out).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.delete(p))
    }
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle dump FIRST, before any query runs: it doubles as the
    // wipe-guard sentinel, so a run killed mid-loop leaves a dir the
    // next invocation recognizes as its own output and resets —
    // written last, an interrupted run would wedge every rerun behind
    // the guard above
    val json = SparkEntry.oracleSql.filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    var crashed = List.empty[String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        crashed ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // Manifest of every declared query + any that crashed, so the gate
    // can detect a query that silently produced no result dir.
    val manifest = s"""{"queries": [${selected.keys.toSeq.sorted.map(q).mkString(",")}], """ +
      s""""crashed": [${crashed.sorted.map(q).mkString(",")}]}"""
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifest)
    spark.stop()
  }
}
