package graft

import graft.kv.Catalog
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SQL surface features riding on the COW catalog: time travel
  * (VERSION/TIMESTAMP AS OF), column DEFAULT values (reference
  * column.sys default, HBaseSchema.kt:141-160), per-table charset
  * (table.sys, HBaseTable.kt:197-216), and the TopKPerGroup
  * per-task group-cardinality bound. */
class SqlFeatureSpec extends AnyFunSuite {
  import TestSpark._

  private def freshSqlCat(tag: String): (Catalog, String) = {
    val wh = Files.createTempDirectory(s"graft_${tag}_wh").toString
    spark.conf.set(s"spark.sql.catalog.$tag",
      classOf[graft.kv.connector.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.warehouse", wh)
    (new Catalog(spark, wh), wh)
  }

  test("VERSION AS OF reads the pre-image snapshot after DELETE") {
    val (cat, _) = freshSqlCat("gtt")
    spark.sql("CREATE TABLE gtt.t (k BIGINT NOT NULL, v STRING) " +
      "TBLPROPERTIES ('primaryKey'='k')")
    spark.sql("INSERT INTO gtt.t VALUES (1,'a'),(2,'b'),(3,'c')")
    val vBefore = cat.dataVersionOf("t")
    spark.sql("DELETE FROM gtt.t WHERE k = 2")
    assert(spark.sql("SELECT * FROM gtt.t").count() == 2)
    // the pre-image is still addressable by version
    val pre = spark.sql(s"SELECT k, v FROM gtt.t VERSION AS OF $vBefore")
    assert(pre.count() == 3)
    assert(pre.filter("k = 2").head().getString(1) == "b")
    // and version 0 is the empty created table
    assert(spark.sql("SELECT * FROM gtt.t VERSION AS OF 0").count() == 0)
    // a never-written version fails with a clear message
    val e = intercept[Exception](
      spark.sql("SELECT * FROM gtt.t VERSION AS OF 999").collect())
    assert(e.getMessage.contains("999"))
  }

  test("VERSION AS OF refuses an unpublished staged snapshot") {
    val (cat, wh) = freshSqlCat("gvu")
    spark.sql("CREATE TABLE gvu.t (k BIGINT NOT NULL, v STRING) " +
      "TBLPROPERTIES ('primaryKey'='k')")
    spark.sql("INSERT INTO gvu.t VALUES (1,'a')")
    val live = cat.dataVersionOf("t")
    // simulate a crashed writer: data_v(live+1) exists on disk but the
    // pointer was never bumped — it holds never-committed content
    val src = java.nio.file.Paths.get(cat.dataPathAt("t", live))
    val dst = java.nio.file.Paths.get(cat.dataPathAt("t", live + 1))
    java.nio.file.Files.createDirectories(dst)
    val s = java.nio.file.Files.list(src)
    try s.forEach(p => java.nio.file.Files.copy(p,
      dst.resolve(p.getFileName.toString)): Unit)
    finally s.close()
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM gvu.t VERSION AS OF ${live + 1}").collect())
    assert(e.getMessage.contains("never published"))
    // the live read is unaffected
    assert(spark.sql("SELECT * FROM gvu.t").count() == 1)
  }

  test("TIMESTAMP AS OF resolves to the newest snapshot at or before the time") {
    val (_, _) = freshSqlCat("gts")
    spark.sql("CREATE TABLE gts.t (k BIGINT NOT NULL, v STRING) " +
      "TBLPROPERTIES ('primaryKey'='k')")
    spark.sql("INSERT INTO gts.t VALUES (1,'a')")
    // far future → the live snapshot
    assert(spark.sql(
      "SELECT * FROM gts.t TIMESTAMP AS OF '2100-01-01 00:00:00'").count() == 1)
    // before the table existed → clear error
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM gts.t TIMESTAMP AS OF '2000-01-01 00:00:00'").collect())
    assert(e.getMessage.toLowerCase.contains("no snapshot"))
  }

  test("TIMESTAMP AS OF resolves from recorded publish times, not dir mtimes") {
    import org.apache.spark.sql.types._
    import java.nio.file.{Paths, attribute}
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_gmt_wh").toString
    val cat = new Catalog(spark, wh)
    cat.createTable("t",
      StructType(Seq(StructField("k", LongType, false),
        StructField("v", StringType))), Seq("k"))
    cat.bulkLoad("t", Seq((1L, "a")).toDF("k", "v"))
    val afterPublish = System.currentTimeMillis()
    // lazy bookkeeping (the range manifest) lands in OLD snapshot dirs
    // when the next merge starts, bumping their mtimes long after
    // publish — simulate the worst case by pushing the dir mtime far
    // into the future; resolution must still come from the recorded
    // publish time
    Files.setLastModifiedTime(Paths.get(wh, "t", "data_v1"),
      attribute.FileTime.fromMillis(afterPublish + 10L * 365 * 24 * 3600 * 1000))
    assert(cat.snapshotAtOrBefore("t", afterPublish).contains(1))
    // and a cutoff before the table existed still resolves to nothing
    assert(cat.snapshotAtOrBefore("t", afterPublish - 3600_000L).isEmpty)
  }

  test("column DEFAULT values: missing INSERT columns fill from stored defaults") {
    val (cat, _) = freshSqlCat("gdef")
    spark.sql("CREATE TABLE gdef.t (k BIGINT NOT NULL, " +
      "v STRING DEFAULT 'dv', n INT DEFAULT 7) " +
      "TBLPROPERTIES ('primaryKey'='k', 'charset'='GBK')")
    spark.sql("INSERT INTO gdef.t (k) VALUES (1)")
    spark.sql("INSERT INTO gdef.t VALUES (2, 'explicit', DEFAULT)")
    val rows = spark.sql("SELECT k, v, n FROM gdef.t ORDER BY k").collect()
    assert(rows(0).getString(1) == "dv" && rows(0).getInt(2) == 7)
    assert(rows(1).getString(1) == "explicit" && rows(1).getInt(2) == 7)
    // defaults survive a catalog restart (persisted in column metadata)
    val reloaded = cat.schemaOf("t")
    assert(reloaded("v").metadata.contains("CURRENT_DEFAULT"))
    assert(reloaded("v").metadata.getString("CURRENT_DEFAULT") == "'dv'")
    // describeTable surfaces column defaults + table charset
    val byName = cat.describeTable("t").collect()
      .map(r => r.getString(1) -> ((Option(r.getString(6)), r.getString(7)))).toMap
    assert(byName("v")._1.contains("'dv'"))
    assert(byName("n")._1.contains("7"))
    assert(byName("k")._1.isEmpty)
    assert(byName("k")._2 == "GBK")
    assert(cat.charsetOf("t") == "GBK")
  }

  test("TopKPerGroup fails fast past the per-task group bound instead of OOMing") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.graft.topk.maxGroupsPerTask")
    spark.conf.set("spark.graft.topk.maxGroupsPerTask", "10")
    try {
      val df = spark.range(0, 10000)
        .select(($"id" % 5000).as("g"), $"id".as("x"))
        .repartition(1) // force all groups into one task
      val e = intercept[Exception](
        graft.plans.TopK.perGroup(df, Seq("g"), Seq(("x", true)), 2).count())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("maxGroupsPerTask")), msgs(e).mkString("|"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.topk.maxGroupsPerTask", v)
        case None => spark.conf.unset("spark.graft.topk.maxGroupsPerTask")
      }
    }
  }
}
