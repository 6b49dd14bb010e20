package graft

import graft.kv.KvLayout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: per-file min/max footprints must be narrow in BOTH
  * dimensions, so a filter on either key column prunes most files —
  * the claim behind writeZOrdered's scale story. */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark._

  private def spans(dir: String, c: String): Seq[(Long, Long)] =
    spark.read.parquet(dir)
      .select(col(c), input_file_name().as("f"))
      .groupBy("f").agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq

  test("z-order narrows per-file ranges in both dimensions vs lexicographic sort") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 40000)
      .map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("x", "y")
    val xDir = java.nio.file.Files.createTempDirectory("graft_zx").toString + "/d"
    val zDir = java.nio.file.Files.createTempDirectory("graft_zz").toString + "/d"
    KvLayout.writeSorted(df, Seq("x"), xDir, partitions = 16)
    KvLayout.writeZOrdered(df, "x", "y", zDir, partitions = 16)

    def avgSpan(s: Seq[(Long, Long)]): Double =
      s.map { case (lo, hi) => (hi - lo).toDouble }.sum / s.size

    // lexicographic layout: y is unclustered — every file spans ~all of y
    val ySorted = spans(xDir, "y")
    assert(avgSpan(ySorted) > 900.0, s"unexpectedly clustered: ${avgSpan(ySorted)}")
    // z-order: both dimensions clustered (16 z-ranges ≈ a 4×4 grid)
    val yZ = spans(zDir, "y")
    val xZ = spans(zDir, "x")
    assert(avgSpan(yZ) < 0.5 * avgSpan(ySorted),
      s"y not clustered under z-order: ${avgSpan(yZ)}")
    assert(avgSpan(xZ) < 600.0, s"x not clustered under z-order: ${avgSpan(xZ)}")

    // the pruning consequence: a point predicate on y overlaps the
    // min/max of a minority of z-ordered files, but every x-sorted
    // file. (y=500 would be the adversarial midline of the z-curve —
    // probe away from the top bit boundary.)
    val yPoint = 137L
    def overlapping(s: Seq[(Long, Long)]): Int =
      s.count { case (lo, hi) => lo <= yPoint && yPoint <= hi }
    assert(overlapping(ySorted) == ySorted.size)
    assert(overlapping(yZ) <= yZ.size / 2,
      s"y=$yPoint overlaps ${overlapping(yZ)}/${yZ.size} z-files")
  }

  test("a table declared layout=zorder writes z-clustered snapshots through every path") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_ztab_wh").toString
    spark.conf.set("spark.sql.catalog.gzt",
      classOf[graft.kv.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gzt.warehouse", wh)
    spark.sql("CREATE TABLE gzt.zt (x BIGINT NOT NULL, y BIGINT NOT NULL, v STRING) " +
      "TBLPROPERTIES ('primaryKey'='x,y', 'layout'='zorder')")
    val cat = new graft.kv.Catalog(spark, wh)
    assert(cat.layoutOf("zt") == "zorder")

    val rnd = new scala.util.Random(11)
    val rows = (0 until 20000)
      .map(i => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong, s"r$i"))
      .groupBy(t => (t._1, t._2)).values.map(_.head).toSeq // unique (x,y) PKs
    cat.bulkLoad("zt", rows.toDF("x", "y", "v"), partitions = 16)

    val live = cat.liveDataPath("zt")
    val xs = spans(live, "x"); val ys = spans(live, "y")
    def avgSpan(s: Seq[(Long, Long)]): Double =
      s.map { case (lo, hi) => (hi - lo).toDouble }.sum / s.size
    assert(avgSpan(xs) < 600.0 && avgSpan(ys) < 600.0,
      s"layout not z-clustered: x=${avgSpan(xs)} y=${avgSpan(ys)}")
    // reads are layout-agnostic: point/range predicates still correct
    val expect = rows.count { case (x, y, _) => x == rows.head._1 }
    assert(spark.sql(s"SELECT * FROM gzt.zt WHERE x = ${rows.head._1}")
      .count() == expect)

    // the layout survives a SQL row-level rewrite: publishStaged
    // republishes the post-image through the declared layout
    // (AQE would coalesce the tiny post-image to one file, which has
    // no spans to measure — hold it open for the assertion)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try spark.sql(s"UPDATE gzt.zt SET v = 'updated' WHERE x = ${rows.head._1}")
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val live2 = cat.liveDataPath("zt")
    val xs2 = spans(live2, "x"); val ys2 = spans(live2, "y")
    assert(xs2.size >= 2, s"post-update snapshot is one file: ${xs2.size}")
    // a LOST layout shows per-file spans ≈ the full 0..999 domain
    // (~990+); a z-clustered one stays well under. The bound leaves
    // headroom for range-partitioner sampling variance — the staged
    // post-image's input partitioning shifts run-to-run under suite
    // load, and a tight bound (700) flaked at 715 with clustering
    // clearly intact (x-span 514)
    assert(avgSpan(xs2) < 850.0 && avgSpan(ys2) < 850.0,
      s"layout lost after UPDATE: x=${avgSpan(xs2)} y=${avgSpan(ys2)}")
    assert(spark.sql("SELECT count(*) FROM gzt.zt").head().getLong(0) == rows.size)
  }
}
