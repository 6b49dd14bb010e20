package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for the mergeable-sketch operator evt_hll_users (no
  * SQL oracle — DataSketches HLL estimates are engine-specific):
  * accuracy vs exact distincts, and the mergeability law the 100 TB
  * rollup relies on (union of per-cell sketches ≡ one sketch over the
  * union of the data). SketchSpec covers the non-mergeable approx
  * aggregates (approx_count_distinct / CMS / percentile_approx). */
class HllMergeSpec extends AnyFunSuite {
  import TestSpark._

  test("hll estimates stay within 5% of exact distinct counts") {
    val ev = Tables.events(spark, sf)
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = ev.agg(countDistinct(col("user_id"))).head.getLong(0)
    val est = SparkEntry.queries("evt_hll_users")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet + "ALL")
    (exact + ("ALL" -> exactAll)).foreach { case (k, n) =>
      val e = est(k)
      assert(math.abs(e - n).toDouble / n <= 0.05,
        s"$k: estimate $e vs exact $n off by >5%")
    }
  }

  test("union of per-type sketches equals one sketch over all events") {
    val ev = Tables.events(spark, sf)
    val viaUnion = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_union_agg(col("sk")).as("sk"))
      .select(hll_sketch_estimate(col("sk"))).head.getLong(0)
    val direct = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head.getLong(0)
    assert(viaUnion == direct)
  }
}
