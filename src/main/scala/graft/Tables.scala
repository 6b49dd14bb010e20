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
  /** events.ts arrives in one of two physical forms depending on the
    * testdata generation: TIMESTAMP(NANOS) parquet (Spark 4 refuses it
    * as a timestamp; with spark.sql.legacy.parquet.nanosAsLong=true —
    * set by Verify/Bench/tests — it lands as epoch-nanos long, which
    * we truncate to µs with exact integer division, never double math:
    * 1.7e18 doesn't fit a double mantissa), or plain timestamp[us]
    * with isAdjustedToUTC=false, which Spark 4 reads as TIMESTAMP_NTZ.
    * Both are normalized to TimestampType: watermarks REQUIRE it, and
    * every session here runs spark.sql.session.timeZone=UTC, so the
    * NTZ→LTZ cast is value-identical. */
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

  /** Events as a file stream whose FILE ORDER IS EVENT-TIME ORDER,
    * plus a trailing per-user sentinel drop ("__flush", 2 h past the
    * last real event) — the contract `Streams.sessionizeStream`
    * documents for its low-latency path: per-user event-time order
    * must hold ACROSS micro-batches (a keyed, roughly-ordered log),
    * and only a gap-exceeding later event closes an open session, so
    * the sentinel is what flushes each user's final session at
    * end-of-input. Four time-range files staged as `batch-00i` with
    * ascending mtimes: the file source takes oldest-(modTime, path)
    * first, so both sort keys agree with event time; one file per
    * trigger ⇒ the state machine genuinely carries open sessions
    * across five micro-batches. */
  private[graft] def eventsStreamOrdered(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val staged = orderedEventDirs.computeIfAbsent(d,
      new java.util.function.Function[String, String] {
        override def apply(k: String): String = {
          val dir = java.nio.file.Files
            .createTempDirectory("graft_events_ordered")
          Runtime.getRuntime.addShutdownHook(new Thread(new Runnable {
            override def run(): Unit = try {
              val w = java.nio.file.Files.walk(dir)
              try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
                .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
              finally w.close()
            } catch { case _: Throwable => }
          }))
          val ev = events(s, d)
          val tmp = dir.resolve("tmp")
          // range partition 0 holds the earliest ts range, ascending
          ev.repartitionByRange(4, col("ts"), col("event_id"))
            .sortWithinPartitions(col("ts"), col("event_id"))
            .write.mode("overwrite").parquet(tmp.toString)
          val parts = {
            val w = java.nio.file.Files.list(tmp)
            try {
              val arr = new java.util.ArrayList[java.nio.file.Path]()
              w.filter(p => p.getFileName.toString.startsWith("part-"))
                .sorted().forEach(p => { arr.add(p); () })
              arr
            } finally w.close()
          }
          val base = System.currentTimeMillis() - 120000L
          var i = 0
          while (i < parts.size()) {
            val dst = dir.resolve(f"batch-$i%03d.parquet")
            java.nio.file.Files.move(parts.get(i), dst)
            java.nio.file.Files.setLastModifiedTime(dst,
              java.nio.file.attribute.FileTime.fromMillis(base + i * 2000L))
            i += 1
          }
          // per-user flush sentinel, STRICTLY after every real file in
          // both sort keys (name "batch-999…" > "batch-004…", mtime
          // base+60 s) and in event time (max ts + 2 h ≫ the 30-min
          // gap), so it reaches every user's state machine last and
          // closes their final real session
          val mx = ev.agg(max(col("ts"))).head.getTimestamp(0)
          val flushTs = new java.sql.Timestamp(mx.getTime + 2L * 3600 * 1000)
          ev.select(col("user_id")).distinct()
            .select((lit(-1L) - col("user_id")).as("event_id"),
              lit(flushTs).as("ts"), col("user_id"),
              lit("__flush").as("event_type"), lit(0.0).as("value"),
              lit(null).cast("string").as("props"))
            .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val sparts = java.nio.file.Files.list(tmp)
          try sparts.filter(p => p.getFileName.toString.startsWith("part-"))
            .forEach { p =>
              val dst = dir.resolve("batch-999.parquet")
              java.nio.file.Files.move(p, dst)
              java.nio.file.Files.setLastModifiedTime(dst,
                java.nio.file.attribute.FileTime.fromMillis(base + 60000L))
              ()
            }
          finally sparts.close()
          // drop the tmp dir (and its _SUCCESS markers) so the stream
          // only ever sees the renamed batch files
          val leftovers = java.nio.file.Files.list(tmp)
          try leftovers.forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
          finally leftovers.close()
          java.nio.file.Files.deleteIfExists(tmp)
          dir.toString
        }
      })
    normalizeEventTs(
      s.readStream.schema(s.read.parquet(staged).schema)
        .option("maxFilesPerTrigger", 1).parquet(staged))
  }
  private val orderedEventDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
