package graft

import graft.kv.KvLayout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing: same-bucketed tables must join with
  * no Exchange (shuffle) in the physical plan. */
class BucketSpec extends AnyFunSuite {
  import TestSpark._

  test("same-bucketed tables join without a shuffle") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      KvLayout.writeBucketed(
        Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
        Seq("l_orderkey"), "b_lineitem", 8)
      KvLayout.writeBucketed(
        Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
        Seq("o_orderkey"), "b_orders", 8)
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
