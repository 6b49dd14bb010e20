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
