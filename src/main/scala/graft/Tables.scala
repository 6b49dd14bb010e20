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
  /** Planted-row id boundary, defined ONCE for every consumer: the
    * dedup/similarity queries plant deterministic duplicate overlays
    * at id + PlantedIdBase (so ids ≥ this are synthetic copies, ids
    * below it are real corpus), ScaleGen guards that scaled-up real
    * ids never cross it, and index-backed searches scope themselves
    * to the real corpus with `< PlantedIdBase`. Moving it anywhere
    * moves it everywhere — that is the point. */
  val PlantedIdBase: Long = 1000000L

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
    // The generated table is a single parquet FILE; the file stream
    // source ingests a DIRECTORY of drops. Stage the events once per
    // (JVM, dir) into a temp landing zone split into several files so
    // the stream genuinely advances state across micro-batches.
    val st = stageOnce(stagedEventDirs, d, "graft_events_stream") { dir =>
      val raw = load(s, d, "events")
      raw.repartition(4).write.mode("overwrite").parquet(dir.toString)
      raw.schema
    }
    normalizeEventTs(
      s.readStream.schema(st.schema).option("maxFilesPerTrigger", 1)
        .parquet(st.dir))
  }
  private val stagedEventDirs =
    new java.util.concurrent.ConcurrentHashMap[String, Staged]()

  /** The documents table as a STREAMING ingest drop (doc_id, text,
    * synthetic arrival ts), with exact copies of doc_id<10 planted at
    * id+PlantedIdBase one hour later — the ingest-dedup ground truth:
    * a duplicate arriving in a LATER micro-batch must be suppressed
    * by state, not by intra-batch distinct. Staging enforces that
    * contract structurally (the eventsStreamOrdered pattern):
    * originals land as batch-000..002 with ascending mtimes, the
    * planted copies as batch-999 strictly last in BOTH file-source
    * sort keys — repartition alone could co-locate a copy with its
    * original in one file and make the cross-batch claim vacuous. */
  private[graft] def documentsStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val st = stageOnce(stagedDocDirs, d, "graft_docs_stream") { dir =>
      val docs = load(s, d, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("ts",
          (lit(1700000000L) + col("doc_id")).cast("timestamp"))
      val planted = load(s, d, "documents")
        .filter(col("doc_id") < 10)
        .select((col("doc_id") + PlantedIdBase).as("doc_id"), col("text"))
        .withColumn("ts",
          (lit(1700000000L) + (col("doc_id") % PlantedIdBase) + 3600L)
            .cast("timestamp"))
      val tmp = dir.resolve("tmp")
      def moveParts(prefixIdx: Int => String): Unit = {
        val w = java.nio.file.Files.list(tmp)
        val arr = new java.util.ArrayList[java.nio.file.Path]()
        try w.filter(p => p.getFileName.toString.startsWith("part-"))
          .sorted().forEach(p => { arr.add(p); () })
        finally w.close()
        val base = System.currentTimeMillis() - 120000L
        var i = 0
        while (i < arr.size()) {
          val name = prefixIdx(i)
          val dst = dir.resolve(name)
          java.nio.file.Files.move(arr.get(i), dst)
          val off = if (name.startsWith("batch-999")) 60000L else i * 2000L
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(base + off))
          i += 1
        }
      }
      docs.repartition(3).write.mode("overwrite").parquet(tmp.toString)
      moveParts(i => f"batch-$i%03d.parquet")
      planted.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      moveParts(_ => "batch-999.parquet")
      docs.schema
    }
    s.readStream.schema(st.schema).option("maxFilesPerTrigger", 1)
      .parquet(st.dir)
  }
  private val stagedDocDirs =
    new java.util.concurrent.ConcurrentHashMap[String, Staged]()

  /** One event type's slice of the events table as its own file
    * stream. The stream-stream join reads views and purchases as two
    * INDEPENDENT sources; staging each side pre-filtered means every
    * micro-batch scans only that side's rows instead of the full
    * events drop re-filtered per side — at scale the two sides of an
    * attribution join genuinely are separate topics/prefixes, so the
    * pre-split staging is the production shape, not a bench trick. */
  private[graft] def eventsStreamByType(s: SparkSession, d: String,
                                        eventType: String): DataFrame = {
    val st = stageOnce(typedEventDirs, s"$d#$eventType",
        s"graft_events_${eventType}_stream") { dir =>
      val slice = events(s, d)
        .filter(org.apache.spark.sql.functions.col("event_type") === eventType)
      slice.repartition(4).write.mode("overwrite").parquet(dir.toString)
      slice.schema
    }
    // already normalized: the slice was written from the normalized
    // batch frame, so ts is TimestampType in the staged footers
    s.readStream.schema(st.schema).option("maxFilesPerTrigger", 1)
      .parquet(st.dir)
  }
  private val typedEventDirs =
    new java.util.concurrent.ConcurrentHashMap[String, Staged]()

  /** A staged stream landing zone: the dir plus the stream schema
    * captured at staging time — callers on the cached path must not
    * pay a fresh parquet footer read per invocation (bench reps call
    * these several times per query). */
  private[graft] final case class Staged(
      dir: String, schema: org.apache.spark.sql.types.StructType)

  /** Stage into a fresh temp dir once per (JVM, key). The build
    * callback fills the dir and returns the schema to stream with.
    * createTempDirectory does not auto-clean; the shutdown hook keeps
    * every Verify/Bench process from leaking a full events copy in
    * /tmp. Registered BEFORE the build so a mid-build crash still
    * reclaims the partial staging. */
  private def stageOnce(cache: java.util.concurrent.ConcurrentHashMap[String, Staged],
                        key: String, prefix: String)
                       (build: java.nio.file.Path => org.apache.spark.sql.types.StructType): Staged =
    cache.computeIfAbsent(key,
      new java.util.function.Function[String, Staged] {
        override def apply(k: String): Staged = {
          val dir = java.nio.file.Files.createTempDirectory(prefix)
          Runtime.getRuntime.addShutdownHook(new Thread(new Runnable {
            override def run(): Unit = try {
              val w = java.nio.file.Files.walk(dir)
              try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
                .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
              finally w.close()
            } catch { case _: Throwable => }
          }))
          Staged(dir.toString, build(dir))
        }
      })

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
    val st = stageOnce(orderedEventDirs, d, "graft_events_ordered") { dir =>
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
      // closes their final real session. An empty events table has no
      // max ts (and nothing to sessionize) — fail with a clear
      // message instead of a NullPointerException mid-staging.
      val mxRow = ev.agg(max(col("ts"))).head
      require(!mxRow.isNullAt(0),
        s"eventsStreamOrdered: events table at $d is empty — nothing to stage")
      val flushTs = new java.sql.Timestamp(mxRow.getTimestamp(0).getTime + 2L * 3600 * 1000)
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
      // the staged files carry ev's already-normalized TimestampType
      ev.schema
    }
    normalizeEventTs(
      s.readStream.schema(st.schema)
        .option("maxFilesPerTrigger", 1).parquet(st.dir))
  }
  private val orderedEventDirs =
    new java.util.concurrent.ConcurrentHashMap[String, Staged]()

  /** Events staged for the BOUNDED-watermark expiry gate
    * (st_stream_expire): drop 0 carries every real event; drop 1 is a
    * SPACER ("__flush" row at max ts); drop 2 replays the first two
    * hours' events as LATE arrivals (ids +1e7, original timestamps);
    * drops 3-4 are flush sentinels ("__flush", max ts + 3 h / + 4 h).
    *
    * The spacer exists because Spark filters late events with the
    * PREVIOUS batch's watermark while evicting with the current one
    * (SPARK-40925's two-value semantics): replays arriving one batch
    * after the full table would still see late-watermark 0 and merge.
    * One spacer batch later the late watermark stands at
    * max(real ts) − delay — days past the replayed rows' window ends
    * — so a bounded-watermark aggregation must DROP every replay
    * deterministically. Two trailing sentinels for the same lag
    * reason: the +4 h drop is the real data batch whose eviction
    * watermark (stats through the +3 h drop) finally passes the last
    * real window end and emits it in append mode — relying on a
    * trailing no-data batch instead would race processAllAvailable. */
  private[graft] def eventsStreamExpiry(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val st = stageOnce(expiryEventDirs, d, "graft_events_expiry") { dir =>
      val ev = events(s, d)
      val tmp = dir.resolve("tmp")
      val base = System.currentTimeMillis() - 120000L
      def stageDrop(df: DataFrame, name: String, slot: Int): Unit = {
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val parts = java.nio.file.Files.list(tmp)
        try parts.filter(p => p.getFileName.toString.startsWith("part-"))
          .forEach { p =>
            val dst = dir.resolve(name)
            java.nio.file.Files.move(p, dst)
            java.nio.file.Files.setLastModifiedTime(dst,
              java.nio.file.attribute.FileTime.fromMillis(base + slot * 2000L))
            ()
          }
        finally parts.close()
        val leftovers = java.nio.file.Files.list(tmp)
        try leftovers.forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        finally leftovers.close()
        java.nio.file.Files.deleteIfExists(tmp): Unit
      }
      val bounds = ev.agg(min(col("ts")), max(col("ts"))).head
      require(!bounds.isNullAt(0),
        s"eventsStreamExpiry: events table at $d is empty — nothing to stage")
      val minTs = bounds.getTimestamp(0)
      val maxTs = bounds.getTimestamp(1)
      require(maxTs.getTime - minTs.getTime >= 4L * 3600 * 1000,
        "eventsStreamExpiry: the expiry gate needs an event span > 4 h " +
          "so replayed first-hours rows are unambiguously late")
      def sentinel(hoursPast: Long) = {
        val fts = new java.sql.Timestamp(maxTs.getTime + hoursPast * 3600 * 1000)
        ev.limit(1).select(lit(-1L - hoursPast).as("event_id"),
          lit(fts).as("ts"), lit(0L).as("user_id"),
          lit("__flush").as("event_type"), lit(0.0).as("value"),
          lit(null).cast("string").as("props"))
      }
      stageDrop(ev, "batch-000.parquet", 0)
      stageDrop(sentinel(0L), "batch-001.parquet", 1)
      stageDrop(ev.filter(col("ts") <
          lit(new java.sql.Timestamp(minTs.getTime + 2L * 3600 * 1000)))
        .withColumn("event_id", col("event_id") + 10000000L),
        "batch-002.parquet", 2)
      stageDrop(sentinel(3L), "batch-003.parquet", 3)
      stageDrop(sentinel(4L), "batch-004.parquet", 4)
      ev.schema
    }
    normalizeEventTs(
      s.readStream.schema(st.schema)
        .option("maxFilesPerTrigger", 1).parquet(st.dir))
  }
  private val expiryEventDirs =
    new java.util.concurrent.ConcurrentHashMap[String, Staged]()

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
