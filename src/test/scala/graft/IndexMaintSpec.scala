package graft

import graft.kv.Catalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Per-write index maintenance (reference KVIndexTable.kt:95-125 —
  * every base Put deletes the stale index row and writes the new one):
  * kv indexes follow every write path synchronously and incrementally;
  * analytic flavors surface staleness and rebuild via refreshIndex. */
class IndexMaintSpec extends AnyFunSuite {
  import TestSpark._

  private val kvSchema = StructType(Seq(
    StructField("k", LongType, false),
    StructField("seg", StringType, true),
    StructField("body", StringType, true)))

  test("kv index follows incremental merges: moved values relocate, new keys appear") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_idxmaint_wh").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("t", kvSchema, Seq("k"))
    cat.bulkLoad("t",
      (0L until 1000L).map(i => (i, s"seg${i % 4}", s"body $i")).toDF("k", "seg", "body"))
    cat.createIndex("t", "by_seg", "kv", Seq("seg"))
    assert(cat.indexStatus("t", "by_seg", "kv") == "FRESH")

    // CDC trickle: k=5 moves seg1->segX, k=2001 arrives with segX
    cat.incrementalMerge("t",
      Seq((5L, "segX", "body 5'"), (2001L, "segX", "fresh")).toDF("k", "seg", "body"))

    assert(cat.indexStatus("t", "by_seg", "kv") == "FRESH")
    val idx = cat.indexData("t", "by_seg", "kv")
    val segX = idx.filter($"ik" === "segX").select("rk").collect().map(_.getLong(0)).toSet
    assert(segX == Set(5L, 2001L), s"segX entries: $segX")
    // the stale entry (seg1, 5) is gone; other seg1 members remain
    val seg1 = idx.filter($"ik" === "seg1").select("rk").collect().map(_.getLong(0)).toSet
    assert(!seg1.contains(5L) && seg1.contains(1L))
    // index row count = table row count (one entry per row)
    assert(idx.count() == cat.table("t").df.count())
    // and a lookup through the index sees the post-write world
    val hit = graft.index.KvIndex.lookup(cat.table("t").df, "k", idx, "segX")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(hit == Set(5L, 2001L))
  }

  test("incremental index patch hard-links untouched index files") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_idxlink_wh").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("t", kvSchema, Seq("k"))
    // value correlated with key: each table file covers a bounded ik
    // range, so a one-file patch maps to a bounded index-file set
    cat.bulkLoad("t",
      (0L until 4000L).map(i => (i, f"v${i / 100}%03d", "b")).toDF("k", "seg", "body"),
      partitions = 4)
    // AQE would coalesce the tiny index into one file — hold it open
    // so the backfill splits into multiple ik ranges for this test
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try cat.createIndex("t", "by_seg", "kv", Seq("seg"))
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val idxDirBefore = Paths.get(wh, "t.kv.by_seg", "data")
    val filesBefore = {
      val s = Files.list(idxDirBefore)
      try {
        val it = s.iterator(); var out = List.empty[java.nio.file.Path]
        while (it.hasNext) { val p = it.next()
          if (p.getFileName.toString.startsWith("part-")) out ::= p }
        out
      } finally s.close()
    }
    assert(filesBefore.size >= 2, s"index not split: ${filesBefore.size} files")

    // patch one key in the FIRST table file (values v000-v009): index
    // files covering the higher ik ranges must carry over as hard links
    cat.incrementalMerge("t", Seq((39L, "v000", "b'")).toDF("k", "seg", "body"))
    val idxDirAfter = Paths.get(wh, "t.kv.by_seg",
      s"data_v${cat.dataVersionOf("t")}")
    assert(Files.exists(idxDirAfter))
    val linked = filesBefore.count { f =>
      val dst = idxDirAfter.resolve(f.getFileName.toString)
      Files.exists(dst) && Files.isSameFile(f, dst)
    }
    assert(linked >= 1, "no untouched index file was carried as a hard link")
  }

  test("analytic index flavors report staleness after BULK writes and refresh on CALL") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_idxstale_wh").toString
    spark.conf.set("spark.sql.catalog.gidx",
      classOf[graft.kv.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gidx.warehouse", wh)
    val cat = new Catalog(spark, wh)
    cat.createTable("t", kvSchema, Seq("k"))
    cat.bulkLoad("t", Seq((1L, "a", "spark join"), (2L, "b", "hbase scan"))
      .toDF("k", "seg", "body"))
    cat.createIndex("t", "ft_body", "fulltext", Seq("body"))
    assert(cat.indexStatus("t", "ft_body", "fulltext") == "FRESH")

    // a whole-snapshot bulk write has no bounded patch to segment:
    // analytic flavors go stale and rebuild on CALL
    cat.bulkLoad("t", Seq((1L, "a", "spark join"), (2L, "b", "hbase scan"),
      (3L, "c", "spark shuffle")).toDF("k", "seg", "body"))
    assert(cat.indexStatus("t", "ft_body", "fulltext").startsWith("STALE"))
    // stale postings don't see doc 3 yet
    assert(cat.indexData("t", "ft_body", "fulltext")
      .filter($"term" === "shuffle").count() == 0)

    spark.sql("CALL gidx.system.refresh_index('t', 'ft_body', 'fulltext')")
    assert(cat.indexStatus("t", "ft_body", "fulltext") == "FRESH")
    assert(cat.indexData("t", "ft_body", "fulltext")
      .filter($"term" === "shuffle").count() == 1)
  }
}
