package graft

import graft.kv.Catalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** CDC replay idempotence: a streaming foreachBatch that crashes after
  * committing but before checkpointing re-delivers the SAME batch.
  * Because the intra-batch duplicate-PK winner is deterministic
  * (max(struct(non-key cols)) — not arrival order) and merges are
  * whole-row upserts, replaying an identical batch must leave the
  * table post-image AND every index view content-identical. */
class ReplaySpec extends AnyFunSuite {
  import TestSpark._

  private val schema = StructType(Seq(
    StructField("k", LongType, false),
    StructField("seg", StringType, true),
    StructField("body", StringType, true)))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("replaying an identical batch leaves table, kv index and fulltext view unchanged") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_replay_wh").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("rep", schema, Seq("k"))
    cat.bulkLoad("rep",
      (0L until 200L).map(i => (i, s"s${i % 4}", s"alpha doc$i"))
        .toDF("k", "seg", "body"), partitions = 2)
    cat.createIndex("rep", "by_seg", "kv", Seq("seg"))
    cat.createIndex("rep", "ft", "fulltext", Seq("body"))

    // the batch carries an intra-batch duplicate PK (k=5 twice): the
    // deterministic winner is max(struct(seg, body)) = (sY, beta)
    val batch = Seq(
      (5L, "sX", "bravo update"), (5L, "sY", "beta update"),
      (9001L, "sZ", "gamma fresh"))
    def stage(order: Seq[(Long, String, String)], parts: Int): String = {
      val dir = cat.stagingPath("rep")
      order.toDF("k", "seg", "body").repartition(parts)
        .write.parquet(dir)
      dir
    }

    cat.upsertStaged("rep", stage(batch, 1))
    val afterTable = rows(cat.table("rep").df)
    val afterKv = rows(cat.indexData("rep", "by_seg", "kv"))
    val afterFt = rows(cat.indexData("rep", "ft", "fulltext"))
    val afterDict = rows(cat.indexDictionary("rep", "ft", "fulltext")
      .select($"term", $"df".cast("long")))
    assert(cat.table("rep").pointGet(5L).head().getString(1) == "sY")

    // replay: same rows, REVERSED order, different partitioning — the
    // delivery shape a restarted stream actually produces
    cat.upsertStaged("rep", stage(batch.reverse, 3))

    assert(rows(cat.table("rep").df) == afterTable, "table post-image changed on replay")
    assert(rows(cat.indexData("rep", "by_seg", "kv")) == afterKv,
      "kv index changed on replay")
    assert(rows(cat.indexData("rep", "ft", "fulltext")) == afterFt,
      "fulltext view changed on replay")
    assert(rows(cat.indexDictionary("rep", "ft", "fulltext")
      .select($"term", $"df".cast("long"))) == afterDict,
      "dictionary view changed on replay")
    // both runs really merged (version advanced twice) — idempotence
    // is in the CONTENT, not a skipped write
    assert(cat.dataVersionOf("rep") >= 3)
    assert(cat.indexStatus("rep", "by_seg", "kv") == "FRESH")
    assert(cat.indexStatus("rep", "ft", "fulltext") == "FRESH")
  }
}
