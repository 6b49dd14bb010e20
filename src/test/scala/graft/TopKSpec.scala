package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom TopKPerGroup operator must agree exactly with the
  * window-function formulation, while using the bounded-heap exec. */
class TopKSpec extends AnyFunSuite {
  import TestSpark._

  test("TopK.perGroup equals window row_number <= k") {
    val o = Tables.orders(spark, sf)
    val viaOp = TopK.perGroup(o, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaOp == viaWindow)
  }

  test("plan uses TopKPerGroupExec with a group-key exchange") {
    val o = Tables.orders(spark, sf)
    val plan = TopK.perGroup(o, Seq("o_custkey"), Seq(("o_totalprice", true)), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(plan.contains("Exchange") || plan.contains("ShuffleExchange"),
      s"no group-key exchange inserted:\n$plan")
  }

  test("RankFilterToTopK rewrites window rank filters automatically") {
    graft.plans.TopK.enableAutoRewrite(spark)
    val o = Tables.orders(spark, sf)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val q = o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"rule did not fire:\n$plan")
    // and the rewritten plan returns the same rows as the un-rewritten
    // logical semantics (k best per customer, rn attached)
    val got = q.select("o_custkey", "o_orderkey", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val manual = graft.plans.TopK.perGroup(o, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 2)
      .withColumn("rn", row_number().over(w))
      .select("o_custkey", "o_orderkey", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == manual)
  }

  test("always-false rank filters stay filters (no k-1 overflow drop)") {
    graft.plans.TopK.enableAutoRewrite(spark)
    val o = Tables.orders(spark, sf)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    // rn < Int.MinValue is always false; Int math would wrap k-1 to
    // Int.MaxValue and the rewrite would DROP the filter entirely
    val q = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") < Int.MinValue)
    assert(q.count() == 0L)
  }

  test("groups smaller than k pass through whole") {
    val o = Tables.orders(spark, sf).filter(col("o_orderkey") < 20)
    val n = TopK.perGroup(o, Seq("o_custkey"), Seq(("o_totalprice", true)), 1000).count()
    assert(n == o.count())
  }
}
