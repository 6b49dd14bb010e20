package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed interval join must (a) agree exactly with the naive
  * non-equi join it replaces, including every bucket-boundary edge,
  * and (b) actually plan as an equality join — the whole point is to
  * never hit BroadcastNestedLoopJoin/CartesianProduct at scale. */
class RangeJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Synthetic intervals/points exercising the edges: zero-length
    * intervals, intervals spanning 1..4 buckets, points exactly on
    * start/end/bucket boundaries, negative coordinates. */
  private lazy val ivs = {
    val rnd = new scala.util.Random(7)
    (0 until 300).map { i =>
      val s = rnd.nextInt(200) - 50   // negative starts too
      val len = rnd.nextInt(4) match {
        case 0 => 0                    // point interval
        case 1 => rnd.nextInt(8)       // sub-bucket
        case _ => rnd.nextInt(32)      // multi-bucket
      }
      (i.toLong, s.toLong, (s + len).toLong, s"k${i % 3}")
    }.toDF("iv_id", "start_d", "end_d", "key")
  }

  private lazy val pts = {
    val rnd = new scala.util.Random(13)
    // half random, half pinned to interval/bucket boundaries
    val random = (0 until 300).map(i => (1000L + i, (rnd.nextInt(260) - 60).toLong, s"k${i % 3}"))
    val pinned = (0 until 100).map(i => (2000L + i, (i * 8 - 56).toLong, s"k${i % 3}"))
    (random ++ pinned).toDF("pt_id", "pt_d", "key")
  }

  private def naivePairs(eqKey: Boolean): Set[(Long, Long)] = {
    val cond = $"pt_d" >= $"start_d" && $"pt_d" <= $"end_d" &&
      (if (eqKey) ivs("key") === pts("key") else lit(true))
    ivs.join(pts, cond)
      .select($"iv_id", $"pt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def bucketedPairs(eqKeys: Seq[String], w: Long): Set[(Long, Long)] =
    RangeJoin.intervalJoin(
        if (eqKeys.isEmpty) ivs.drop("key") else ivs,
        if (eqKeys.isEmpty) pts.drop("key") else pts,
        "start_d", "end_d", "pt_d", eqKeys, w)
      .select($"iv_id", $"pt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketed interval join matches the naive non-equi join (with eq keys)") {
    val expected = naivePairs(eqKey = true)
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 7L, 8L, 64L))
      assert(bucketedPairs(Seq("key"), w) == expected, s"bucketWidth=$w diverged")
  }

  test("bucketed interval join matches the naive join (pure range, no eq keys)") {
    val expected = naivePairs(eqKey = false)
    assert(expected.nonEmpty)
    assert(bucketedPairs(Seq.empty, 8L) == expected)
  }

  test("bucketed plan is an equality join, naive pure-range plan is a nested loop") {
    val bucketed = RangeJoin.intervalJoin(ivs.drop("key"), pts.drop("key"),
      "start_d", "end_d", "pt_d", Seq.empty, 8L)
    val bPlan = bucketed.queryExecution.executedPlan.toString
    assert(!bPlan.contains("NestedLoop") && !bPlan.contains("CartesianProduct"),
      s"bucketed join fell back to a nested loop:\n$bPlan")
    val naive = ivs.join(pts, $"pt_d" >= $"start_d" && $"pt_d" <= $"end_d")
    val nPlan = naive.queryExecution.executedPlan.toString
    assert(nPlan.contains("NestedLoop") || nPlan.contains("CartesianProduct"),
      "expected the naive pure-range join to be a nested loop (baseline check)")
  }

  test("q30's aggregate-below-join rewrite matches the naive per-pair aggregation") {
    import org.apache.spark.sql.types.DecimalType
    val day = datediff(col("o_orderdate").cast("date"),
      lit("1990-01-01").cast("date")).cast("long")
    val o = Tables.orders(spark, sf)
    val naiveIvs = o.select(col("o_orderkey").as("iv_key"),
        col("o_orderpriority").as("prio"), day.as("start_d"))
      .withColumn("end_d", col("start_d") + (col("iv_key") % 7) + lit(1L))
    val naivePts = o.select(col("o_orderkey").as("pt_key"),
      col("o_orderpriority").as("pt_prio"), day.as("pt_d"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
    val naive = naiveIvs.join(naivePts,
        col("prio") === col("pt_prio") &&
        col("pt_d").between(col("start_d"), col("end_d")) &&
        col("pt_key") =!= col("iv_key"))
      .groupBy(col("iv_key"))
      .agg(count(lit(1)).as("n_in_window"),
        sum(col("price")).cast("double").as("window_total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rewritten = SparkEntry.queries("q30_interval_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(naive.nonEmpty && rewritten == naive)
  }

  test("each matching pair meets in exactly one bucket (no duplicate matches)") {
    val out = RangeJoin.intervalJoin(ivs, pts, "start_d", "end_d", "pt_d", Seq("key"), 8L)
      .groupBy($"iv_id", $"pt_id").agg(count(lit(1)).as("n"))
      .filter($"n" > 1).count()
    assert(out == 0L)
  }

  test("band join matches |a-b| <= maxDiff exactly") {
    val expected = ivs.join(pts,
        $"start_d" - 5L <= $"pt_d" && $"pt_d" <= $"start_d" + 5L &&
        ivs("key") === pts("key"))
      .select($"iv_id", $"pt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = RangeJoin.bandJoin(ivs, pts, "start_d", "pt_d", Seq("key"), 5L)
      .select($"iv_id", $"pt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty && got == expected)
  }

  test("reversed intervals (end < start) match nothing, like the naive BETWEEN join") {
    // includes a hugely-reversed span that would walk ~10^11 DESCENDING
    // buckets if sequence(lo, hi) were fed directly
    val rev = Seq((1L, 50L, 10L), (2L, Long.MaxValue / 2, 0L), (3L, 4L, 4L))
      .toDF("iv_id", "start_d", "end_d")
    val got = RangeJoin.intervalJoin(rev, pts.drop("key"),
        "start_d", "end_d", "pt_d", Seq.empty, 8L)
      .select($"iv_id", $"pt_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = rev.join(pts.drop("key"), $"pt_d".between($"start_d", $"end_d"))
      .select($"iv_id", $"pt_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    // only the zero-length (not reversed) interval can match
    assert(got.forall(_._1 == 3L))
  }

  test("a pathological interval fails fast instead of exploding") {
    val bad = Seq((1L, 0L, Long.MaxValue / 2)).toDF("iv_id", "start_d", "end_d")
    val e = intercept[Exception] {
      RangeJoin.intervalJoin(bad, pts.drop("key"),
        "start_d", "end_d", "pt_d", Seq.empty, 8L).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("buckets")),
      s"expected the bucket-guard error, got: $e")
  }
}
