package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Genuine Structured Streaming runs (readStream → memory sink),
  * checked against the batch forms of the same transforms. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def events = Tables.events(spark, sf)

  /** readStream needs a directory; stage the single events.parquet
    * file into a temp dir once. */
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  /** readStream over the staged dir, ts normalized to TimestampType
    * (the staged file carries whatever physical form the generator
    * used — epoch-nanos long or timestamp_ntz — and watermarks demand
    * TIMESTAMP; Tables.normalizeEventTs handles every form). */
  private def stagedStream = Tables.normalizeEventTs(
    spark.readStream.schema(Tables.load(spark, sf, "events").schema)
      .parquet(streamDir))


  test("streaming dedup keeps one event per key, state bounded by watermark") {
    val stream = stagedStream
    val key = concat_ws(":", col("user_id"), col("event_type"))
    val q = graft.streaming.Streams.dedupStream(stream, "ts", key)
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("dedup_sink").count()
    val batch = events.dropDuplicates("user_id", "event_type").count()
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    // one row per key, each an actual input row
    val keys = spark.table("dedup_sink")
      .select(concat_ws(":", col("user_id"), col("event_type")).as("k"))
      .collect().map(_.getString(0))
    assert(keys.length == keys.distinct.length)
  }

  test("streaming dedup passes NULL-key rows through un-deduped") {
    val stream = stagedStream
    // even user_ids get a NULL key: those events are NOT duplicates of
    // each other and must all survive
    val key = when(col("user_id") % 2 === 0, lit(null).cast("string"))
      .otherwise(concat_ws(":", col("user_id"), col("event_type")))
    val q = graft.streaming.Streams.dedupStream(stream, "ts", key)
      .writeStream.format("memory").queryName("dedup_null_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("dedup_null_sink")
    assert(out.filter(col("user_id") % 2 === 0).count() ==
      events.filter(col("user_id") % 2 === 0).count())
    assert(out.filter(col("user_id") % 2 =!= 0).count() ==
      events.filter(col("user_id") % 2 =!= 0)
        .dropDuplicates("user_id", "event_type").count())
  }

  test("stream-stream attribution join equals the batch time-range join") {
    def staged = stagedStream
    val q = graft.streaming.Streams.attributionJoin(
        staged.filter(col("event_type") === "view"),
        staged.filter(col("event_type") === "purchase"))
      .writeStream.format("memory").queryName("attr_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("attr_sink")
      .select("view_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.streaming.Streams.attributionJoin(
        events.filter(col("event_type") === "view"),
        events.filter(col("event_type") === "purchase"))
      .select("view_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch && batch.nonEmpty,
      s"stream ${streamed.size} pairs vs batch ${batch.size}")
  }

  test("asOf join survives payload names that also exist on the left") {
    import spark.implicits._
    val l = Seq((1L, 10L, "L1"), (1L, 20L, "L2"), (2L, 15L, "L3"))
      .toDF("k", "t", "value") // "value" collides with the right payload
    val r = Seq((1L, 10L, "R@10"), (1L, 18L, "R@18"), (2L, 99L, "late"))
      .toDF("k", "ts", "value")
    val out = graft.operators.AsOfJoin.asOf(l, r, Seq("k"), "t", "ts",
        payload = Seq("value" -> "state"), tieCols = Seq("ts"))
      .orderBy("k", "t").collect()
      .map(row => (row.getAs[Long]("k"), row.getAs[String]("value"),
        row.getAs[String]("state")))
    assert(out.toSeq == Seq(
      (1L, "L1", "R@10"),   // inclusive <=
      (1L, "L2", "R@18"),   // latest state wins
      (2L, "L3", null)))    // no state yet
  }

  test("asOf join: NULL keys and NULL times follow equi-join semantics") {
    import spark.implicits._
    // a right row with NULL time must never match (NULL <= t is not
    // TRUE) — without filtering it would sort nulls-first and act as
    // state at -infinity; NULL keys must not match NULL keys either
    val l = Seq((Some(1L), Some(10L), "L1"), (Some(1L), None, "Lnull"),
        (None, Some(10L), "Lkeyless"))
      .toDF("k", "t", "tag")
    val r = Seq((Some(1L), None, "bad-null-time"),
        (Some(1L), Some(5L), "good"),
        (None, Some(1L), "bad-null-key"))
      .toDF("k", "ts", "state")
    val out = graft.operators.AsOfJoin.asOf(l, r, Seq("k"), "t", "ts",
        payload = Seq("state" -> "state"), tieCols = Seq("ts"))
      .collect().map(row => row.getAs[String]("tag") -> row.getAs[String]("state"))
      .toMap
    assert(out.size == 3) // every left row survives (left-join contract)
    assert(out("L1") == "good")       // real state, not the null-time row
    assert(out("Lnull") == null)      // NULL left time matches nothing
    assert(out("Lkeyless") == null)   // NULL keys don't match NULL keys
  }

  test("streaming windowed agg equals batch hourly agg") {
    val schema = events.schema
    // stream the same parquet through the watermarked plan
    val q = Streams.hourlyTypeAggStream(stagedStream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .select("hour", "event_type", "n", "total_value")
        .collect().map(_.toSeq).toSet
      val batch = Streams.hourlyTypeAgg(events)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch, "streaming result differs from batch")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization matches batch closed sessions") {
    val batch = Streams.sessionize(events)
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    // the streaming form only emits CLOSED sessions (the last session
    // per user stays open in state), so compare on the closed subset
    val lastPerUser = Streams.sessionize(events)
      .groupBy("user_id").agg(max("session_id").as("last_sid"))
    val closedBatch = Streams.sessionize(events)
      .join(lastPerUser, Seq("user_id"))
      .filter(col("session_id") < col("last_sid"))
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet

    val q = Streams.sessionizeStream(spark, stagedStream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sessions_out")
        .select("user_id", "session_start", "n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      // single micro-batch ⇒ closed sessions must match the batch ones
      assert(streamed == closedBatch,
        s"streamed=${streamed.size} closedBatch=${closedBatch.size}")
    } finally q.stop()
  }

  test("multimodal meta extract preserves row count and is deterministic") {
    import graft.multimodal.Multimodal
    val docs = Tables.documents(spark, sf)
    val meta1 = Multimodal.extractMeta(spark, Multimodal.withPayload(docs))
      .collect().map(m => (m.doc_id, m.byte_len, m.width, m.height, m.format)).toSet
    val meta2 = Multimodal.extractMeta(spark, Multimodal.withPayload(docs))
      .collect().map(m => (m.doc_id, m.byte_len, m.width, m.height, m.format)).toSet
    assert(meta1 == meta2 && meta1.size == docs.count())
  }
}
