package graft

import graft.kv.{Catalog, KvTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class KvSpec extends AnyFunSuite {
  import TestSpark._

  private def customers = KvTable(Tables.customer(spark, sf), Seq("c_custkey"))

  test("pointGet returns exactly the keyed row") {
    val rows = customers.pointGet(7L).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("c_custkey") == 7L)
  }

  test("multiGet returns one row per existing key") {
    assert(customers.multiGet(Seq(1L, 2L, 3L, 999999L)).count() == 3)
  }

  test("rangeScan is [start, stop) like HBase") {
    val keys = customers.rangeScan(10L, 15L).select("c_custkey")
      .collect().map(_.getLong(0)).sorted
    assert(keys.sameElements(Array(10L, 11L, 12L, 13L, 14L)))
  }

  test("upsert overlays existing keys and appends new ones") {
    import spark.implicits._
    val pre = customers.df.count()
    val patch = Seq((1L, "Customer#000000001", 99, 0.0, "PATCHED"),
                    (9000000L, "NewCustomer", 1, 1.0, "NEW"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .withColumn("c_nationkey", col("c_nationkey").cast("int"))
    val post = customers.upsert(patch)
    assert(post.df.count() == pre + 1)
    assert(post.pointGet(1L).select("c_mktsegment").head().getString(0) == "PATCHED")
  }

  test("delete removes exactly the keyed rows") {
    val post = customers.delete(Seq(1L, 2L))
    assert(post.df.count() == customers.df.count() - 2)
    assert(post.pointGet(1L).count() == 0)
  }

  test("filter pushdown reaches the parquet scan") {
    val plan = customers.filterScan(col("c_acctbal") > 100.0, col("c_nationkey") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(c_acctbal"), s"no pushdown in plan:\n$plan")
  }

  test("catalog: create/load/describe/list/drop round-trip") {
    val wh = java.nio.file.Files.createTempDirectory("graft_test_wh").toString
    val cat = new Catalog(spark, wh)
    val schema = StructType(Seq(
      StructField("k", LongType, false),
      StructField("v", StringType, true)))
    cat.createTable("t1", schema, primaryKey = Seq("k"))
    assert(cat.listTables() == Seq("t1"))
    intercept[IllegalArgumentException](cat.createTable("t1", schema, Seq("k")))
    intercept[IllegalArgumentException](
      cat.createTable("bad", StructType(Seq(StructField("id", LongType))), Seq("id")))
    intercept[IllegalArgumentException](
      cat.createTable("bad2", schema, primaryKey = Seq()))
    import spark.implicits._
    cat.bulkLoad("t1", Seq((1L, "x"), (2L, "y")).toDF("k", "v"))
    assert(cat.table("t1").pointGet(2L).count() == 1)
    val desc = cat.describeTable("t1").collect()
    assert(desc.length == 2 && desc.exists(r =>
      r.getAs[String]("column_name") == "k" && r.getAs[Boolean]("is_primary")))
    cat.dropTable("t1")
    assert(cat.listTables().isEmpty)
  }
}
