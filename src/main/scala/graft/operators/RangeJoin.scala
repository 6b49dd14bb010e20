package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval join: `point ∈ [start, end]` (+ optional equality
  * keys) as an EQUALITY join, not a nested loop.
  *
  * Spark has no native interval-join operator: a join whose only (or
  * extra) predicate is a range lands on BroadcastNestedLoopJoin or
  * CartesianProduct — O(|L|·|R|) work and a single-task bottleneck at
  * scale. The reference world solves point-in-interval with a second
  * index table; the Spark-first shape is bucket decomposition
  * (the standard interval-join trick in Flink/streaming engines):
  *
  *  - pick a bucket width `w`; an interval [s, e] covers buckets
  *    ⌊s/w⌋..⌊e/w⌋ (⌈len/w⌉+1 rows after explode — bounded when
  *    intervals are bounded),
  *  - a point p lands in exactly ONE bucket ⌊p/w⌋,
  *  - equi-join on (eqKeys, bucket) — a plain shuffled hash/sort-merge
  *    join that partitions across the cluster — then apply the exact
  *    range predicate inside the bucket.
  *
  * Because each (interval, point) pair can only meet in the point's
  * single bucket, the result needs NO dedup. Choosing w ≈ the typical
  * interval length keeps the interval blow-up ≤2× and each bucket's
  * candidate set small; skewed buckets are AQE's skew-join problem,
  * same as any hot join key.
  */
object RangeJoin {

  /** Join `intervals` to `points` where
    * `points(pointCol) BETWEEN intervals(startCol) AND intervals(endCol)`
    * and all `eqKeys` (present on both sides) match. start/end/point
    * columns must be numeric (cast times to epoch units first) and
    * named distinctly from each other; output carries all columns of
    * both inputs with eqKeys deduplicated.
    *
    * `maxBucketsPerInterval` fails the job fast (with the offending
    * span in the error) instead of letting one unbounded/garbage
    * interval explode into millions of bucket rows and OOM a task —
    * if legitimate intervals trip it, `bucketWidth` is mis-sized for
    * the data; raise the width, not the cap. */
  def intervalJoin(intervals: DataFrame, points: DataFrame,
                   startCol: String, endCol: String, pointCol: String,
                   eqKeys: Seq[String], bucketWidth: Long,
                   maxBucketsPerInterval: Long = 4096L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(!intervals.columns.contains("__bucket") &&
      !points.columns.contains("__bucket"),
      "inputs may not carry the reserved __bucket column")
    val lo = floor(col(startCol) / bucketWidth).cast("long")
    val hi = floor(col(endCol) / bucketWidth).cast("long")
    // span computed in decimal(38,0): a long `hi - lo` overflows
    // negative for extreme garbage bounds (span > Long.MaxValue, e.g.
    // bucketWidth=1 with near-Long.Min/Max endpoints) and would sail
    // past this guard into Spark's opaque sequence-length error
    val span = hi.cast("decimal(38,0)") - lo.cast("decimal(38,0)")
    val guarded = when(span >= maxBucketsPerInterval,
      raise_error(concat(
        lit(s"intervalJoin: interval spans > $maxBucketsPerInterval buckets " +
          s"(bucketWidth=$bucketWidth) at ${startCol}="), col(startCol).cast("string"),
        lit(s", ${endCol}="), col(endCol).cast("string"))))
      .otherwise(hi)
    // reversed intervals (end < start) match nothing under the naive
    // BETWEEN join — expand them to ZERO buckets for the same result;
    // without this branch sequence(lo, hi) would DESCEND through
    // ~|span| buckets, sailing around the blow-up guard above
    val buckets = when(hi < lo, array().cast("array<long>"))
      .otherwise(sequence(lo, guarded))
    val expanded = intervals.withColumn("__bucket", explode(buckets))
    val probes = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    expanded.join(probes, eqKeys :+ "__bucket")
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }

  /** Band join: match rows whose numeric values differ by at most
    * `maxDiff` (|left(leftVal) − right(rightVal)| ≤ maxDiff), plus
    * equality keys — the symmetric special case of the interval join
    * (interval = [v−maxDiff, v+maxDiff]), with the same bucketed
    * equi-join plan. */
  def bandJoin(left: DataFrame, right: DataFrame,
               leftVal: String, rightVal: String,
               eqKeys: Seq[String], maxDiff: Long): DataFrame = {
    require(maxDiff >= 0, s"maxDiff must be non-negative, got $maxDiff")
    // BOTH sides: a right column named __band_lo/__band_hi would
    // collide with the working columns and the final drop would
    // silently remove the right side's data column too
    require(!left.columns.exists(_.startsWith("__band_")),
      "left may not carry reserved __band_ columns")
    require(!right.columns.exists(_.startsWith("__band_")),
      "right may not carry reserved __band_ columns")
    val intervals = left
      .withColumn("__band_lo", col(leftVal) - maxDiff)
      .withColumn("__band_hi", col(leftVal) + maxDiff)
    intervalJoin(intervals, right, "__band_lo", "__band_hi", rightVal,
        eqKeys, bucketWidth = math.max(1L, 2L * maxDiff))
      .drop("__band_lo", "__band_hi")
  }
}
