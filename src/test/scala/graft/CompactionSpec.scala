package graft

import graft.kv.Catalog
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction (the HBase-compaction analog): small-file residue from
  * incremental merges bin-packs into fewer files, rows and big files
  * untouched, history still readable. */
class CompactionSpec extends AnyFunSuite {
  import TestSpark._

  private def partFiles(dir: java.nio.file.Path): List[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(dir)
    try {
      val it = s.iterator()
      var out = List.empty[java.nio.file.Path]
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.startsWith("part-")) out ::= p
      }
      out
    } finally s.close()
  }

  test("compact bin-packs small files, keeps rows, links big files, preserves history") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_compact_wh").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("ct",
      StructType(Seq(
        StructField("k", LongType, false),
        StructField("v", StringType, true))),
      primaryKey = Seq("k"))

    // base snapshot: one reasonably-sized file
    cat.bulkLoad("ct", (0L until 2000L).map(i => (i, s"v$i")).toDF("k", "v"),
      partitions = 1)
    // two CDC trickles with keys beyond the base range: each appends a
    // small file and hard-links the untouched base file across
    cat.incrementalMerge("ct", Seq((2001L, "a")).toDF("k", "v"))
    cat.incrementalMerge("ct", Seq((2002L, "b")).toDF("k", "v"))

    val vBefore = cat.dataVersionOf("ct")
    val dirBefore = java.nio.file.Paths.get(cat.liveDataPath("ct"))
    val before = partFiles(dirBefore)
    val bySize = before.sortBy(p => -java.nio.file.Files.size(p))
    val bigFile = bySize.head // the base file dwarfs the two patch files
    assert(before.size >= 3, s"expected >=3 part files, got ${before.size}")
    val rowsBefore = cat.table("ct").df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    // target sized so the base file counts as big, the trickles as small
    cat.compact("ct", targetFileBytes = java.nio.file.Files.size(bigFile))

    assert(cat.dataVersionOf("ct") == vBefore + 1)
    val dirAfter = java.nio.file.Paths.get(cat.liveDataPath("ct"))
    val after = partFiles(dirAfter)
    assert(after.size < before.size,
      s"compaction did not reduce file count: ${before.size} -> ${after.size}")
    // the big file carried across as a hard link (same inode, no I/O)
    val carried = dirAfter.resolve(bigFile.getFileName.toString)
    assert(java.nio.file.Files.exists(carried))
    assert(java.nio.file.Files.isSameFile(bigFile, carried))
    // row set identical
    val rowsAfter = cat.table("ct").df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rowsAfter == rowsBefore)
    // pre-compaction snapshot still readable (time travel)
    assert(cat.tableAt("ct", vBefore).df.count() == rowsBefore.size)

    // idempotent: everything is now at/above target → no-op, no bump
    cat.compact("ct", targetFileBytes = 1L)
    assert(cat.dataVersionOf("ct") == vBefore + 1)
  }

  /** VERDICT r7 item: a LONG CDC chain must not accrete metadata. 200
    * micro-batches against an indexed table, maintenance every 50 —
    * manifest carry-forward, publishTimes, the txn-journal dir and the
    * index segment stack all stay bounded by the maintenance cadence
    * (never O(total batches)), and the final compact+vacuum collapses
    * everything to O(1) dirs per table while reads stay exact. */
  test("200-batch CDC chain: metadata stays bounded; final compact+vacuum collapses it") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val wh = java.nio.file.Files.createTempDirectory("graft_chain_wh").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("ch",
      StructType(Seq(
        StructField("k", LongType, false),
        StructField("body", StringType, true))),
      primaryKey = Seq("k"))
    cat.bulkLoad("ch",
      (0L until 500L).map(i => (i, s"base word$i")).toDF("k", "body"),
      partitions = 2)
    cat.createIndex("ch", "ft", "fulltext", Seq("body"))

    def entries(p: java.nio.file.Path): List[String] = {
      if (!java.nio.file.Files.exists(p)) return Nil
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala.map(_.getFileName.toString).toList
      finally s.close()
    }
    val tdir = java.nio.file.Paths.get(wh, "ch")
    val idir = java.nio.file.Paths.get(wh, "ch.fulltext.ft")
    val expected = scala.collection.mutable.Map[Long, String]()
    (0L until 500L).foreach(i => expected(i) = s"base word$i")

    var maxTableEntries = 0
    var maxIndexEntries = 0
    (1 to 200).foreach { i =>
      // mix of updates (k < 500) and inserts (k >= 500), 2 rows/batch
      val rows = Seq((i % 500).toLong -> s"upd$i word$i",
        (500L + i) -> s"ins$i word$i")
      rows.foreach { case (k, b) => expected(k) = b }
      cat.incrementalMerge("ch", rows.toDF("k", "body"))
      if (i % 50 == 0) {
        cat.compact("ch"); cat.compactIndex("ch", "ft", "fulltext")
        cat.vacuum("ch", graceMs = 0L)
      }
      maxTableEntries = math.max(maxTableEntries, entries(tdir).size)
      maxIndexEntries = math.max(maxIndexEntries, entries(idir).size)
    }
    // bounded DURING the chain: entries accrue only between maintenance
    // passes (<= families x cadence + constant — FIVE segment-dir
    // families per merge: seg, posseg, tomb, dictdelta, normseg —
    // never the 200-batch total)
    assert(maxTableEntries < 80, s"table dir peaked at $maxTableEntries entries")
    assert(maxIndexEntries < 290, s"index dir peaked at $maxIndexEntries entries")

    cat.compact("ch"); cat.compactIndex("ch", "ft", "fulltext")
    cat.vacuum("ch", graceMs = 0L)

    // O(1) residue: live data dir + meta + lock (+ manifest inside the
    // data dir), one live index data_v + dict_v — no segment stack, no
    // version history, no journal backlog
    val tAfter = entries(tdir)
    assert(tAfter.size <= 5, s"table dir after vacuum: $tAfter")
    assert(tAfter.count(_.startsWith("data_v")) == 1, tAfter.toString)
    val iAfter = entries(idir)
    assert(iAfter.count(_.startsWith("data_v")) == 1, iAfter.toString)
    assert(iAfter.count(_.startsWith("dict_v")) == 1, iAfter.toString)
    assert(iAfter.count(_.startsWith("pos_v")) == 1, iAfter.toString)
    assert(iAfter.count(_.startsWith("norms_v")) == 1, iAfter.toString)
    assert(iAfter.count(_.startsWith("bmx_v")) == 1, iAfter.toString)
    assert(!iAfter.exists(n => n.startsWith("seg_v") || n.startsWith("tomb_v") ||
      n.startsWith("dictdelta_v") || n.startsWith("posseg_v") ||
      n.startsWith("normseg_v")), iAfter.toString)
    assert(entries(java.nio.file.Paths.get(wh, "_graft_txn"))
      .count(_.endsWith(".json")) == 0, "journal backlog")
    // publishTimes pruned to the live version, not one entry per batch
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(tdir.resolve("_graft_meta.json")))
    val nTimes = meta.path("publishTimes").size()
    assert(nTimes <= 2, s"publishTimes carries $nTimes entries")

    // and the data is exact: every one of the 200 patches applied once
    val got = cat.table("ch").df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.size == expected.size)
    assert(got == expected.toMap)
    // the folded index answers a search planted by the LAST patch,
    // which touched k=200 (update "upd200 word200") and k=700
    // (insert "ins200 word200")
    val hits = graft.index.FullText.searchAll(cat.table("ch").df, "k",
        cat.indexData("ch", "ft", "fulltext"), Seq("word200"))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(hits == Set(200L, 700L))
  }
}

/** The SQL surface for index DDL + maintenance: DSv2 procedures on the
  * graft catalog (`CALL cat.system.create_index/compact/vacuum/...`).
  * The reference serves CREATE/DROP INDEX as SQL through Calcite
  * (HBaseSchema.kt:262-319); this is the Spark-idiomatic equivalent. */
class ProcedureSpec extends AnyFunSuite {
  import TestSpark._

  test("CALL procedures drive index DDL, compaction and vacuum") {
    val wh = java.nio.file.Files.createTempDirectory("graft_proc_wh").toString
    spark.conf.set("spark.sql.catalog.gproc",
      classOf[graft.kv.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gproc.warehouse", wh)
    val cat = new graft.kv.Catalog(spark, wh)

    spark.sql("CREATE TABLE gproc.pt (k BIGINT NOT NULL, seg STRING) " +
      "TBLPROPERTIES ('primaryKey'='k')")
    spark.sql("INSERT INTO gproc.pt VALUES (1, 'A'), (2, 'B')")
    spark.sql("INSERT INTO gproc.pt VALUES (3, 'A')")

    // index DDL through SQL
    spark.sql("CALL gproc.system.create_index('pt', 'by_seg', 'kv', 'seg')")
    assert(cat.indexesOf("pt").exists { case (n, ty, cols) =>
      n == "by_seg" && ty == "KV" && cols == Seq("seg") })
    spark.sql("CALL gproc.system.drop_index('pt', 'by_seg', 'kv')")
    assert(!cat.indexesOf("pt").exists(_._1 == "by_seg"))

    // compaction: the two insert batches left small files; default
    // 128MB target packs them and bumps the version
    val vBefore = cat.dataVersionOf("pt")
    spark.sql("CALL gproc.system.compact('pt')")
    assert(cat.dataVersionOf("pt") == vBefore + 1)
    assert(spark.sql("SELECT * FROM gproc.pt").count() == 3)

    // vacuum with zero staging grace drops the dead snapshots
    spark.sql("CALL gproc.system.vacuum('pt', 0)")
    val left = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(wh, "pt"))
      try {
        val it = s.iterator(); var n = List.empty[String]
        while (it.hasNext) n ::= it.next().getFileName.toString
        n.filter(_.startsWith("data_v"))
      } finally s.close()
    }
    assert(left == List(s"data_v${cat.dataVersionOf("pt")}"), left.toString)
    assert(spark.sql("SELECT * FROM gproc.pt").count() == 3)
  }
}
