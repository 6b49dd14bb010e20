package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming analytics over the `events` table.
  *
  * The reference declares StreamableTable among the Calcite table
  * kinds it surveys (reference: HBaseTable.kt:31-38); HBase itself
  * feeds streaming ingest via Puts. Spark-first, the stream surface is
  * Structured Streaming: `readStream` → watermark → windowed/sessional
  * aggregation → sink, with `flatMapGroupsWithState` for custom state.
  *
  * Each transform below is written against a plain DataFrame so the
  * SAME code runs in batch (for the DuckDB oracle) and as a streaming
  * query (tests attach it to readStream + memory sink). This is the
  * Spark idiom: one logical plan, two execution modes.
  */
object Streams {

  /** Tumbling-window aggregation: events per (hour, type) with an
    * exact decimal value sum. In streaming mode this is the canonical
    * watermark + window plan; keyed shuffle is (window × type) so it
    * scales with key cardinality, not input size. */
  def hourlyTypeAgg(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))

  /** Same aggregation, genuinely streaming (watermarked). */
  def hourlyTypeAggStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** The bounded-watermark (expiring) form for APPEND mode: rows whose
    * window closed more than `delay` before the stream's high-water
    * mark are dropped by the stateful operator's late-data filter, and
    * a window emits exactly once, when the watermark passes its end —
    * the production semantics of a continuous ingest (state size is
    * bounded by delay × rate, not by the stream's history).
    *
    * "__flush" sentinel rows are NOT filtered here, deliberately: a
    * pre-aggregation filter on event_type gets pushed by Catalyst
    * below the EventTimeWatermark node (and a post-aggregation filter
    * on the grouping key pushes through the Aggregate just the same),
    * and sentinels that never reach the watermark stats collector
    * never advance it — the final real windows would then sit in
    * state forever, unevicted. Sentinel groups are emitted only if
    * the watermark ever passes their own window end; callers staging
    * sentinels within `delay + window` of end-of-input never see
    * them, and the caller filters the SINK output defensively. */
  def hourlyTypeAggExpiring(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Gap-based sessionization (30-min inactivity closes a session),
    * batch form: lag + cumulative-sum-of-boundaries per user. One
    * shuffle on user_id; window functions stay within partitions. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionAcc(startTs: Timestamp, lastUs: Long, n: Long)
  case class Session(user_id: Long, session_start: Timestamp, n_events: Long)

  /** Streaming sessionization with custom state — the
    * flatMapGroupsWithState form of `sessionize`, emitting a session
    * when the gap closes it. Event-time ordering within a micro-batch
    * is handled by sorting the group's batch slice.
    *
    * CONTRACT: per-user event-time order must hold ACROSS micro-batches
    * (in-batch disorder is sorted away, cross-batch is not — there is
    * no watermark buffer here). An event arriving in a later batch
    * with an earlier timestamp regresses the open session's last-seen
    * time and can split sessions differently from the batch form. For
    * sources that can deliver cross-batch-late data, window the input
    * with session_window + watermark instead (bounded lateness, same
    * gap semantics) — this operator is the low-latency path for
    * per-key-ordered sources (e.g. a keyed log). */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
                       gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val gapSec = gapMinutes * 60L
    // µs-precision epoch, and the batch form's gap rule:
    // floor-second difference > gap
    def usOf(ts: Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    def secOf(us: Long): Long = Math.floorDiv(us, 1000000L)
    events.select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionAcc], Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[List[SessionAcc]]) =>
          val sorted = evs.toSeq.sortBy(e => (usOf(e.ts), e.event_id))
          var open = state.getOption.flatMap(_.headOption)
          val closed = scala.collection.mutable.ListBuffer.empty[Session]
          sorted.foreach { e =>
            val t = usOf(e.ts)
            open match {
              case Some(acc) if secOf(t) - secOf(acc.lastUs) <= gapSec =>
                open = Some(acc.copy(lastUs = t, n = acc.n + 1))
              case Some(acc) =>
                closed += Session(uid, acc.startTs, acc.n)
                open = Some(SessionAcc(e.ts, t, 1))
              case None =>
                open = Some(SessionAcc(e.ts, t, 1))
            }
          }
          state.update(open.toList)
          closed.iterator
      }.toDF()
  }

  /** Stream-stream inner join with watermarked state on both sides:
    * each view joins purchases by the same user within
    * [view, view + horizon] — the streaming attribution join. Both
    * watermarks plus the time-range condition let Spark expire join
    * state, so state size is bounded by (rate × horizon), not by the
    * stream's history. */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
                      horizonMinutes: Int = 60,
                      watermark: String = "2 hours"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", watermark)
    v.join(p,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("v_user").as("user_id"), col("view_id"),
        col("purchase_id"), col("v_ts"), col("p_ts"), col("value"))
  }

  /** Streaming exact dedup for a document/event firehose: first
    * occurrence per content key wins, later duplicates arriving within
    * the watermark are dropped, and the dedup STATE expires with the
    * watermark instead of growing unboundedly — the streaming form of
    * `Dedup.exact`, which is what a continuous training-data ingest
    * actually runs at 100 TB/day. */
  def dedupStream(stream: DataFrame, tsCol: String,
                  key: org.apache.spark.sql.Column,
                  watermark: String = "1 hour",
                  keyNonNull: Boolean = false): DataFrame = {
    // NULL-key rows pass through un-deduped: dropDuplicates groups
    // NULL keys as equal, so a null content key (e.g. null text) would
    // keep ONE such event per watermark and silently drop the rest —
    // distinct documents lost in ingest. The passthrough union scans
    // the source a SECOND time per micro-batch (both branches
    // re-evaluate the whole upstream, key expression included) — a
    // caller that can PROVE its key non-null (e.g. a canonical URL
    // derived from a non-null dim join) sets keyNonNull and skips the
    // second scan entirely, halving per-batch key computation.
    val keyed = stream.withColumn("__graft_dedup_key", key)
      .withWatermark(tsCol, watermark)
    if (keyNonNull)
      keyed.dropDuplicatesWithinWatermark("__graft_dedup_key")
        .drop("__graft_dedup_key")
    else
      keyed.filter(col("__graft_dedup_key").isNotNull)
        .dropDuplicatesWithinWatermark("__graft_dedup_key")
        .unionByName(keyed.filter(col("__graft_dedup_key").isNull))
        .drop("__graft_dedup_key")
  }

  /** Per-bucket rotating-Bloom state for [[stableBloomDedupStream]]:
    * two generations of one bit-set each plus the current generation's
    * insert count — CONSTANT size however long the stream runs. */
  case class BloomGen(cur: Array[Byte], prev: Array[Byte], n: Long)

  /** BOUNDED-MEMORY streaming content dedup — the stable-Bloom
    * (rotating-generation) form of [[dedupStream]], the production
    * crawl-frontier shape: dropDuplicates' exact state grows one entry
    * per distinct key forever, which an unbounded ingest cannot hold,
    * while this operator's state is buckets × 2 × mBits/8 bytes
    * CONSTANT (Deng & Rafiei 2006's stable Bloom filter, realized as
    * the two-generation rotation memcached/Cassandra-style systems
    * use: inserts land in the current generation; when it has absorbed
    * `capacity` distinct keys the older generation is dropped and the
    * pair rotates, so a key is remembered for at least `capacity` and
    * at most 2×`capacity` subsequent distinct arrivals).
    *
    * The trade, explicitly: a Bloom hit may be a false positive — a
    * genuinely-new key suppressed, at the standard ~(1−e^(−kn/m))^k
    * rate — and a key re-arriving after its generation rotated away
    * re-emits. Both are the documented semantics of an at-most-bounded
    * -state dedup, NOT defects; the spec pins the undersaturated case
    * exact (state far from capacity ⇒ emitted == first-per-key) and
    * the saturated case bounded.
    *
    * Sharding: keys hash (xxhash64, the engine's one cross-component
    * hash) and shard by hash mod `buckets`, one filter pair per bucket
    * — each bucket is an independent stable Bloom, so the operator
    * distributes like any keyed state (at 1000 executors, buckets
    * spread across state-store partitions; memory per executor stays
    * (buckets/executors) × 2 × mBits/8). Emits one row per ACCEPTED
    * (first-seen) key: its 64-bit key hash, column `fp` — callers
    * join or group downstream. */
  def stableBloomDedupStream(spark: SparkSession, stream: DataFrame,
                             key: org.apache.spark.sql.Column,
                             buckets: Int = 32, mBits: Int = 1 << 20,
                             capacity: Long = 0L): DataFrame = {
    import spark.implicits._
    require(buckets > 0, "buckets must be positive")
    require(mBits >= 64 && (mBits & 7) == 0,
      s"mBits must be a multiple of 8 >= 64: $mBits")
    val cap = if (capacity > 0L) capacity else math.max(1L, mBits / 10L)
    val empty = () => new Array[Byte](mBits / 8)
    stream.select(xxhash64(key).as("h")).as[Long]
      .groupByKey(h => java.lang.Math.floorMod(h, buckets.toLong).toInt)
      .flatMapGroupsWithState[BloomGen, Long](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, hs: Iterator[Long], state: GroupState[BloomGen]) =>
          val st = state.getOption.getOrElse(BloomGen(empty(), empty(), 0L))
          var cur = st.cur
          var prev = st.prev
          var n = st.n
          val out = scala.collection.mutable.ListBuffer.empty[Long]
          hs.foreach { h =>
            val seen = graft.kv.BloomBits.mightContain(cur, h) ||
              graft.kv.BloomBits.mightContain(prev, h)
            if (!seen) {
              out += h
              graft.kv.BloomBits.set(cur, h)
              n += 1
              if (n >= cap) { prev = cur; cur = empty(); n = 0 }
            }
          }
          state.update(BloomGen(cur, prev, n))
          out.iterator
      }.toDF("fp")
  }

  /** One micro-batch of a streaming upsert into a catalog KV table:
    * fold the batch to last-write-wins per key on the (tsCol, seqCol)
    * total order, then merge CONDITIONALLY — a row only overwrites a
    * strictly older table state. Conditionality is what buys the two
    * laws a foreachBatch sink needs (StreamingSpec pins both):
    * batch-order INDEPENDENCE (the final table is the global argmax
    * per key however the source split into batches) and replay
    * IDEMPOTENCE (a re-delivered batch finds nothing strictly newer
    * and commits nothing — exactly-once semantics over an
    * at-least-once trigger). Each call rewrites only the files its
    * keys touch (incremental merge via the range manifest). */
  def upsertLatestBatch(cat: graft.kv.Catalog, table: String,
                        batch: DataFrame, keyCol: String, tsCol: String,
                        seqCol: String): Unit = {
    val curDf = cat.table(table).df // ONE snapshot frame: cols + join side
    val cols = curDf.columns.toSeq
    val others = cols.filterNot(_ == keyCol)
    val latest = batch.groupBy(col(keyCol))
      .agg(max_by(struct(others.map(col): _*),
        struct(col(tsCol), col(seqCol))).as("__w"))
      .select(col(keyCol) +: others.map(o => col(s"__w.$o").as(o)): _*)
    val cur = curDf
      .select(col(keyCol), col(tsCol).as("__old_ts"), col(seqCol).as("__old_seq"))
    // Materialize the winners ONCE, on the DRIVER (they are
    // micro-batch-bounded — patch-sized by the trigger contract): one
    // bounded collect replaces the round-20 localCheckpoint + separate
    // key-collect pair, and the merge receives a LocalRelation patch,
    // so its key pruning and the rewrite's anti-join build side never
    // re-execute the batch-fold + current-table join (2-4 scheduled
    // jobs saved per micro-batch; A/B in OPTIMIZATION_r21.md). Memory
    // class: ≤ maxRows winner rows on the driver — the same bound the
    // fulltext driver-segment path (driverSegmentMaxRows) and
    // upsertStaged's key probe already assume. An over-bound batch
    // (misconfigured trigger, backfill replay) falls back to the
    // distributed merge, whose own key collect is bounded too.
    val winners = latest.join(cur, Seq(keyCol), "left")
      .filter(col("__old_ts").isNull ||
        struct(col(tsCol), col(seqCol)) > struct(col("__old_ts"), col("__old_seq")))
      .select(cols.map(col): _*)
    val maxRows = cat.spark.conf
      .getOption("spark.graft.merge.driverPatchMaxRows")
      .map(_.toInt).getOrElse(10000)
    val probe = winners.limit(maxRows + 1).collect()
    if (probe.length <= maxRows) cat.incrementalMergeRows(table, probe): Unit
    else {
      val materialized = winners.localCheckpoint(true)
      try cat.incrementalMergeIfNonEmpty(table, materialized): Unit
      finally { materialized.unpersist(); () }
    }
  }
}
