package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst handles
  * predicate pushdown / column pruning / partition coalescing — the
  * Spark-native equivalent of the reference's region-server scan
  * pushdown (reference: HBaseProjectableFilterableTable.kt:16).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    * read as a timestamp. With spark.sql.legacy.parquet.nanosAsLong=true
    * (set by Verify/Bench/tests) it arrives as epoch-nanos long; we
    * truncate to µs with exact integer division (never double math —
    * 1.7e18 doesn't fit a double mantissa) and restore TimestampType. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))

  /** The events table as a genuine file-source STREAM: the same
    * parquet directory read via `readStream`, one file per
    * micro-batch, so watermarked/stateful plans execute through the
    * real incremental engine (StateStore, watermark advancement)
    * instead of the batch planner. The file source is exactly how a
    * 100 TB ingest lands in practice (object-store drops discovered
    * per trigger); schema comes from the batch footer read since
    * streaming sources cannot infer. */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    // The generated table is a single parquet FILE; the file stream
    // source ingests a DIRECTORY of drops. Stage the events once per
    // (JVM, dir) into a temp landing zone split into several files so
    // the stream genuinely advances state across micro-batches.
    val staged = stagedEventDirs.computeIfAbsent(d,
      new java.util.function.Function[String, String] {
        override def apply(k: String): String = {
          val dir = java.nio.file.Files
            .createTempDirectory("graft_events_stream")
          // createTempDirectory does not auto-clean; without this hook
          // every Verify/Bench process leaks a full events copy in /tmp
          Runtime.getRuntime.addShutdownHook(new Thread(new Runnable {
            override def run(): Unit = try {
              val w = java.nio.file.Files.walk(dir)
              try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
                .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
              finally w.close()
            } catch { case _: Throwable => }
          }))
          raw.repartition(4).write.mode("overwrite").parquet(dir.toString)
          dir.toString
        }
      })
    normalizeEventTs(
      s.readStream.schema(raw.schema).option("maxFilesPerTrigger", 1)
        .parquet(staged))
  }
  private val stagedEventDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def normalizeEventTs(raw: DataFrame): DataFrame =
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
