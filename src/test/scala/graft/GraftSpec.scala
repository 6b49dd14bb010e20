package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

/** Every declared query runs and returns rows at sf0.001, and every
  * oracle key refers to a declared query. */
class EntrySpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("all declared queries run non-empty at sf0.001") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows: $empty")
  }
}

/** Sketch aggregates: approximate structures the engine offers for
  * cardinality/frequency at scale (HLL via approx_count_distinct,
  * CountMinSketch via stat.countMinSketch) — accuracy-bounded tests
  * since no cross-engine oracle can match sketch internals. */
class SketchSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("HLL cardinality within 5% of exact") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("count-min sketch frequency estimate bounds the true count") {
    val o = Tables.orders(spark, sf)
    val cms = o.stat.countMinSketch("o_orderpriority", eps = 0.001,
      confidence = 0.99, seed = 42)
    val truth = o.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n && est <= n + (0.001 * o.count()).toLong + 1,
        s"$k est=$est true=$n")
    }
  }

  test("percentile_approx within tolerance of exact percentile") {
    val o = Tables.orders(spark, sf)
    val exact = o.select(expr("percentile(o_totalprice, 0.5)")).head().getDouble(0)
    val approx = o.select(expr("percentile_approx(o_totalprice, 0.5, 1000)"))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.05)
  }
}

/** PII scrub: every planted email/phone/IP must be redacted, and the
  * counts must see exactly the planted occurrences. */
class PiiSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._
  import graft.functions.TextFunctions

  test("scrub redacts every planted PII occurrence and no-ops clean docs") {
    import spark.implicits._
    val out = SparkEntry.queries("txt_pii_scrub")(spark, sf).collect()
    out.foreach { r =>
      val (id, nEmails, nIps, nPhones) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))
      if (id % 2 == 0)
        assert(nEmails >= 1 && nIps >= 1 && nPhones >= 1,
          s"doc $id planted PII not counted: $r")
    }
    // scrubbed text must carry the tags and zero residual matches
    val scrubbed = Tables.documents(spark, sf).filter($"doc_id" === 0)
      .withColumn("text", concat($"text",
        lit(" Contact user0@mail.example.com or 555-100-1000 at 10.0.0.0.")))
      .select(TextFunctions.piiScrub($"text").as("clean"),
        TextFunctions.piiCount(TextFunctions.piiScrub($"text"),
          TextFunctions.EmailRe).as("resid_email"))
      .head()
    assert(scrubbed.getString(0).contains("[EMAIL]") &&
      scrubbed.getString(0).contains("[PHONE]") &&
      scrubbed.getString(0).contains("[IP]"))
    assert(scrubbed.getInt(1) == 0)
  }
}
