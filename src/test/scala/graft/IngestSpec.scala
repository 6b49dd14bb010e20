package graft

import graft.kv.Catalog
import graft.operators.Skew
import graft.streaming.MutationIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class IngestSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming mutation ingest merges last-writer-wins into the catalog table") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_ingest_wh").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("user_state",
      StructType(Seq(
        StructField("user_id", LongType, false),
        StructField("event_type", StringType, true),
        StructField("value", DoubleType, true))),
      primaryKey = Seq("user_id"))

    // mutations = the events table streamed in; key user_id,
    // order by ts (tie event_id)
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = spark.readStream
      .schema(Tables.load(spark, sf, "events").schema)
      .parquet(dir.toString)
    val stream =
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw

    val q = MutationIngest.start(spark, stream, cat, "user_state",
      keyCol = "user_id", orderCol = "ts", tieCol = "event_id")
    try q.processAllAvailable() finally q.stop()

    // expected: latest event per user from the batch table
    val expected = MutationIngest.latestPerKey(
        Tables.events(spark, sf), "user_id", "ts", "event_id")
      .select("user_id", "event_type", "value")
      .collect().map(_.toSeq).toSet
    val got = cat.table("user_state").df
      .select("user_id", "event_type", "value")
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    // snapshots: v0 empty, current non-empty
    assert(cat.dataVersionOf("user_state") >= 1)
    assert(cat.tableAt("user_state", 0).df.count() == 0)
  }

  test("salted aggregation equals plain aggregation") {
    val li = Tables.lineitem(spark, sf)
    val salted = Skew.saltedSumCount(li, Seq("l_returnflag"), "l_quantity", 8)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val plain = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(math.abs(s - plain(k)._1) < 1e-6 && n == plain(k)._2)
    }
  }

  test("salted join equals plain join") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val plain = l.join(o, Seq("o_orderkey")).count()
    val salted = Skew.saltedJoin(l, o, "o_orderkey", 4).count()
    assert(salted == plain)
  }
}
