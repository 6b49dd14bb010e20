package graft.kv

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the driver-side serving path: on prebuilt
  * long-, int- and string-keyed tables, ARBITRARY multi-gets and
  * range scans (including extreme, out-of-range and non-ASCII
  * bounds) must return exactly the rows the Spark path returns.
  * The tables are built once; each trial only queries. */
class ServingPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark, graft.TempWarehouses.scoped("servprop", sf))
    def fresh(n: String): Unit = if (c.tableExists(n)) c.dropTable(n)
    fresh("lt"); fresh("it"); fresh("st")
    c.createTable("lt", StructType(Seq(
      StructField("k", LongType, false), StructField("v", LongType, true))), Seq("k"))
    c.bulkLoad("lt", (0 until 200).map(i => (i * 7L - 300L, i.toLong))
      .toDF("k", "v"), partitions = 4)
    c.createTable("it", StructType(Seq(
      StructField("k", IntegerType, false), StructField("v", LongType, true))), Seq("k"))
    c.bulkLoad("it", (0 until 200).map(i => (i * 11 - 500, i.toLong))
      .toDF("k", "v"), partitions = 4)
    c.createTable("st", StructType(Seq(
      StructField("k", StringType, false), StructField("v", LongType, true))), Seq("k"))
    val strKeys = (0 until 100).map(i => s"k${i}x") ++
      Seq("pua", "😀emoji", "ümlaut", "中文", "")
    c.bulkLoad("st", strKeys.distinct.filter(_.nonEmpty).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v"), partitions = 4)
    c
  }

  private def check(p: Prop, name: String, trials: Int = 40): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(trials), p)
    assert(r.passed, s"$name: $r")
  }

  test("long-key gets and ranges match the Spark path for arbitrary bounds") {
    val keyGen = Gen.chooseNum(-1000L, 2000L)
    check(Prop.forAll(Gen.listOfN(4, keyGen), keyGen, keyGen) { (ks, a, b) =>
      val gotGet = cat.driverMultiGet("lt", ks.distinct.map(Seq(_)))
        .map(_.getLong(1)).sorted
      val wantGet = cat.table("lt").df.filter(col("k").isin(ks.distinct: _*))
        .collect().map(_.getAs[Long]("v")).sorted.toSeq
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val gotRange = cat.driverRangeScan("lt", lo, hi).map(_.getLong(1)).sorted
      val wantRange = cat.table("lt").df
        .filter(col("k") >= lo && col("k") <= hi)
        .collect().map(_.getAs[Long]("v")).sorted.toSeq
      gotGet == wantGet && gotRange == wantRange
    }, "long keys")
  }

  test("int-key gets and ranges match incl. bounds far outside int space") {
    // bounds drawn from the FULL long range: exercises the clamp
    // (a wrapped intValue() once turned 0..Long.MaxValue into k <= -1)
    // and the unrepresentable-key drop (4294967297L aliasing int 1)
    val keyGen = Gen.oneOf(Gen.chooseNum(-600L, 2000L),
      Gen.oneOf(4294967297L, Long.MaxValue, Long.MinValue, Int.MaxValue + 1L))
    check(Prop.forAll(Gen.listOfN(4, keyGen), keyGen, keyGen) { (ks, a, b) =>
      val gotGet = cat.driverMultiGet("it", ks.distinct.map(Seq(_)))
        .map(_.getLong(1)).sorted
      val inRange = ks.distinct.filter(k => k >= Int.MinValue && k <= Int.MaxValue)
      val wantGet =
        if (inRange.isEmpty) Seq.empty[Long]
        else cat.table("it").df.filter(col("k").isin(inRange.map(_.toInt): _*))
          .collect().map(_.getAs[Long]("v")).sorted.toSeq
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val gotRange = cat.driverRangeScan("it", lo, hi).map(_.getLong(1)).sorted
      val wantRange = cat.table("it").df
        .filter(col("k").cast("long") >= lo && col("k").cast("long") <= hi)
        .collect().map(_.getAs[Long]("v")).sorted.toSeq
      gotGet == wantGet && gotRange == wantRange
    }, "int keys")
  }

  test("string-key gets and ranges match incl. non-ASCII bounds") {
    val keyGen = Gen.oneOf(
      Gen.chooseNum(0, 120).map(i => s"k${i}x"),
      Gen.oneOf("pua", "😀emoji", "ümlaut", "中文", "zzz", "A"))
    check(Prop.forAll(Gen.listOfN(3, keyGen), keyGen, keyGen) { (ks, a, b) =>
      val gotGet = cat.driverMultiGet("st", ks.distinct.map(Seq(_)))
        .map(_.getLong(1)).sorted
      val wantGet = cat.table("st").df.filter(col("k").isin(ks.distinct: _*))
        .collect().map(_.getAs[Long]("v")).sorted.toSeq
      // Spark's string ordering is UTF8String binary order — the same
      // unsigned byte order the driver path uses, so >=/<= agree
      val (lo, hi) = if (utf8Le(a, b)) (a, b) else (b, a)
      val gotRange = cat.driverRangeScan("st", lo, hi).map(_.getLong(1)).sorted
      val wantRange = cat.table("st").df
        .filter(col("k") >= lo && col("k") <= hi)
        .collect().map(_.getAs[Long]("v")).sorted.toSeq
      gotGet == wantGet && gotRange == wantRange
    }, "string keys", trials = 30)
  }

  private def utf8Le(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < math.min(x.length, y.length)) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length <= y.length
  }
}
