package graft

import graft.kv.Catalog
import graft.similarity.{Ann, Pq, VectorIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The catalog's persisted `vector` index flavor: DDL build persists
  * centroids + PQ codebooks + cluster-sorted encoded entries; CDC
  * merges keep it FRESH via encoded segments (assign-to-existing-
  * centroid, the cheap write path); compact_index RE-TRAINS from the
  * folded entries; crashes between artifact writes heal. The ANN
  * analog of the reference's persisted Lucene directory
  * (reference: index/lucene/LuceneIndexTable.kt, HBaseDirectory.kt). */
class VectorIndexSpec extends AnyFunSuite {
  import TestSpark._

  private val dim = 16

  /** Deterministic clustered vectors: 8 well-separated directions plus
    * per-id noise — k-means recovers the clusters, exact copies are
    * unambiguous top-1 hits. */
  private def vec(i: Long): Seq[Float] = {
    val rnd = new scala.util.Random(i * 7919 + 13)
    val c = (i % 8).toInt
    // noise sized so DISTINCT same-cluster vectors stay clearly below
    // cosine 1.0 after 3-dp rounding (tiny noise makes them round to
    // 1.0 and steal exact-copy top-1 on the nn tiebreak)
    Seq.tabulate(dim)(j =>
      (if (j % 8 == c) 4f else 0f) + rnd.nextFloat() * 2f)
  }

  private val schema = StructType(Seq(
    StructField("k", LongType, false),
    StructField("v", ArrayType(FloatType, false), true)))

  private def rowsDf(ids: Seq[Long], of: Long => Seq[Float] = vec) = {
    import spark.implicits._
    ids.map(i => (i, of(i))).toDF("k", "v")
  }

  private def freshCat(tag: String): (Catalog, String) = {
    val wh = Files.createTempDirectory(s"graft_${tag}_wh").toString
    (new Catalog(spark, wh), wh)
  }

  private def builtCat(tag: String, n: Int = 400): (Catalog, String) = {
    val (cat, wh) = freshCat(tag)
    cat.createTable("t", schema, Seq("k"))
    cat.bulkLoad("t", rowsDf(0L until n.toLong), partitions = 2)
    cat.createIndex("t", "ann", "vector", Seq("v"))
    (cat, wh)
  }

  /** Top-1 neighbor per query id through a given search flavor, using
    * queries that are EXACT COPIES of indexed vectors (query ids offset
    * so the self-match filter doesn't fire). */
  private def top1(cat: Catalog, flavor: String,
                   copiesOf: Seq[Long]): Map[Long, (Long, Double)] = {
    val (view, cent, meta) = cat.vectorIndexView("t", "ann")
    val q = rowsDf(copiesOf.map(_ + 500000L), i => vec(i - 500000L))
    val res = flavor match {
      case "ivf" => Ann.ivfSearch(VectorIndex.ivfOf(cent, view), q, "k", "v", k = 3)
      case "pq" => Pq.pqSearch(VectorIndex.pqOf(meta, view),
        cat.table("t").df, q, "k", "v", topK = 3)
      case "ivfpq" => Pq.ivfPqSearch(VectorIndex.ivfPqOf(meta, cent, view),
        cat.table("t").df, q, "k", "v", topK = 3)
    }
    res.filter(col("rn") === 1).collect()
      .map(r => r.getLong(0) - 500000L -> (r.getLong(2), r.getDouble(3))).toMap
  }

  private def mtimes(dir: java.nio.file.Path): Map[String, Long] = {
    val s = Files.list(dir)
    try {
      val it = s.iterator(); var out = Map.empty[String, Long]
      while (it.hasNext) { val p = it.next()
        out += (p.getFileName.toString -> Files.getLastModifiedTime(p).toMillis) }
      out
    } finally s.close()
  }

  private def copyDir(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    Files.createDirectories(dst)
    val s = Files.list(src)
    try {
      val it = s.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (Files.isDirectory(p)) copyDir(p, dst.resolve(p.getFileName.toString))
        else Files.copy(p, dst.resolve(p.getFileName.toString)): Unit
      }
    } finally s.close()
  }

  test("build persists centroids+codebooks+entries; every flavor finds exact copies") {
    val (cat, wh) = builtCat("vecbuild")
    val idxDir = Paths.get(wh, "t.vector.ann")
    Seq("data", "cent", "vmeta").foreach(n =>
      assert(Files.exists(idxDir.resolve(n)), s"missing $n"))
    assert(cat.indexStatus("t", "ann", "vector") == "FRESH")
    // entries carry one row per base row with both code columns
    val (view, cent, meta) = cat.vectorIndexView("t", "ann")
    assert(view.count() == 400)
    assert(view.schema.fieldNames.toSet ==
      Set("rk", "cluster", "v", "codes", "rcodes"))
    assert(cent.count() >= 2)
    assert(meta.cbPlain.nonEmpty && meta.cbResid.nonEmpty)
    // an exact copy of an indexed vector is the top-1 hit at cosine 1
    // for every search flavor served from the PERSISTED index
    val probe = Seq(3L, 57L, 140L, 333L)
    Seq("ivf", "pq", "ivfpq").foreach { f =>
      val got = top1(cat, f, probe)
      probe.foreach { i =>
        assert(got(i) == (i, 1.0), s"$f top-1 for copy of $i: ${got(i)}")
      }
    }
  }

  test("CDC merge keeps FRESH via encoded segments; base untouched; copies searchable") {
    val (cat, wh) = builtCat("veccdc")
    val idxDir = Paths.get(wh, "t.vector.ann")
    val before = mtimes(idxDir.resolve("data"))
    // patch: copies of 3 base vectors land under new ids
    cat.incrementalMerge("t", rowsDf(Seq(1003L, 1057L, 1140L),
      i => vec(i - 1000L)))
    assert(cat.indexStatus("t", "ann", "vector") == "FRESH")
    val v = cat.dataVersionOf("t")
    assert(Files.exists(idxDir.resolve(s"seg_v$v")))
    assert(Files.exists(idxDir.resolve(s"tomb_v$v")))
    assert(mtimes(idxDir.resolve("data")) == before,
      "base entries dir was rewritten by a CDC merge")
    // recall THROUGH the merge: a query copying vec(3) must hit BOTH
    // the backfilled 3 and the patch-merged 1003 at cosine 1 — the
    // patch was assigned to the same centroid by the same metric
    val (view, cent, _) = cat.vectorIndexView("t", "ann")
    val q = rowsDf(Seq(500003L), i => vec(3L))
    val hits = Ann.ivfSearch(VectorIndex.ivfOf(cent, view), q, "k", "v", k = 5)
      .filter(col("score") === 1.0).select("nn")
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(3L, 1003L), s"got $hits")
  }

  test("re-patching a vector is last-writer-wins in the segmented view") {
    val (cat, _) = builtCat("veclww", n = 200)
    // rewrite id 5's CONTENT twice across merges
    cat.incrementalMerge("t", rowsDf(Seq(5L), _ => vec(600L)))
    cat.incrementalMerge("t", rowsDf(Seq(5L), _ => vec(601L)))
    assert(cat.indexStatus("t", "ann", "vector") == "FRESH")
    val (view, cent, _) = cat.vectorIndexView("t", "ann")
    val mine = view.filter(col("rk") === 5L).collect()
    assert(mine.length == 1, s"expected one live entry for rk 5, got ${mine.length}")
    // a copy of the FINAL content finds 5; the stale contents don't
    val q = rowsDf(Seq(500601L), _ => vec(601L))
    val hit = Ann.ivfSearch(VectorIndex.ivfOf(cent, view), q, "k", "v", k = 1)
      .select("nn", "score").head
    assert(hit.getLong(0) == 5L && hit.getDouble(1) == 1.0)
  }

  test("compact_index re-trains from folded entries; view equivalent; segments reclaimed") {
    val (cat, wh) = builtCat("vecfold")
    cat.incrementalMerge("t", rowsDf(Seq(1003L, 1057L), i => vec(i - 1000L)))
    val probe = Seq(3L, 57L, 140L)
    val beforeIvf = top1(cat, "ivf", probe)
    cat.compactIndex("t", "ann", "vector")
    val live = cat.dataVersionOf("t")
    val idxDir = Paths.get(wh, "t.vector.ann")
    Seq("data_v", "cent_v", "vmeta_v").foreach(p =>
      assert(Files.exists(idxDir.resolve(s"$p$live")), s"missing $p$live"))
    cat.vacuum("t", graceMs = 0L)
    assert(!Files.exists(idxDir.resolve(s"seg_v$live")))
    assert(!Files.exists(idxDir.resolve(s"tomb_v$live")))
    // pre-fold bases aged out; the re-trained triple serves
    assert(!Files.exists(idxDir.resolve("data")))
    assert(!Files.exists(idxDir.resolve("cent")))
    assert(!Files.exists(idxDir.resolve("vmeta")))
    val (view, _, _) = cat.vectorIndexView("t", "ann")
    assert(view.count() == 402)
    // exact-copy hits survive the re-train (centroids may move; the
    // copy still lands in — and probes — its vector's list)
    assert(top1(cat, "ivf", probe) == beforeIvf)
    Seq("pq", "ivfpq").foreach { f =>
      val got = top1(cat, f, probe)
      probe.foreach(i => assert(got(i) == (i, 1.0), s"$f after fold: ${got(i)}"))
    }
  }

  test("a crashed fold's orphan cent/vmeta do not poison the next fold or readers") {
    val (cat, wh) = builtCat("veccrashfold", n = 200)
    cat.incrementalMerge("t", rowsDf(Seq(1003L), i => vec(3L)))
    val live = cat.dataVersionOf("t")
    val idxDir = Paths.get(wh, "t.vector.ann")
    // simulate: a fold wrote vmeta_v(live) + cent_v(live), died before
    // data_v(live). Readers must keep pairing at the OLD base version —
    // pairing orphan centroids with old cluster ids would mis-probe.
    copyDir(idxDir.resolve("vmeta"), idxDir.resolve(s"vmeta_v$live"))
    copyDir(idxDir.resolve("cent"), idxDir.resolve(s"cent_v$live"))
    val got = top1(cat, "ivf", Seq(3L))
    assert(got(3L) == (3L, 1.0))
    // the retried fold heals the orphans and completes
    cat.compactIndex("t", "ann", "vector")
    assert(Files.exists(idxDir.resolve(s"data_v$live")))
    val after = top1(cat, "ivf", Seq(3L, 57L))
    assert(after(3L)._2 == 1.0 && after(57L) == (57L, 1.0))
  }

  test("a crashed merge attempt's vector segments are healed, never served") {
    import spark.implicits._
    val (cat, wh) = builtCat("veccrashmerge", n = 200)
    cat.incrementalMerge("t", rowsDf(Seq(1003L), i => vec(3L)))
    val live = cat.dataVersionOf("t")
    val next = live + 1
    val idxDir = Paths.get(wh, "t.vector.ann")
    // dead attempt: segment dirs toward `next` holding a never-
    // published patch's content, index as-of bumped, then death before
    // the table pointer bump
    copyDir(idxDir.resolve(s"seg_v$live"), idxDir.resolve(s"seg_v$next"))
    copyDir(idxDir.resolve(s"tomb_v$live"), idxDir.resolve(s"tomb_v$next"))
    val mf = Paths.get(wh, "t", "_graft_meta.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(Files.readString(mf))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val idxArr = node.get("indexes")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    (0 until idxArr.size()).foreach { i =>
      idxArr.get(i).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        .put("asOfVersion", next): Unit
    }
    Files.writeString(mf, om.writeValueAsString(node))
    // the real merge toward `next` must heal and publish ITS patch
    cat.incrementalMerge("t", rowsDf(Seq(9L), _ => vec(602L)))
    assert(cat.dataVersionOf("t") == next)
    assert(cat.indexStatus("t", "ann", "vector") == "FRESH")
    val (view, cent, _) = cat.vectorIndexView("t", "ann")
    assert(view.filter($"rk" === 9L).count() == 1)
    val q = rowsDf(Seq(500602L), _ => vec(602L))
    val hit = Ann.ivfSearch(VectorIndex.ivfOf(cent, view), q, "k", "v", k = 1)
      .select("nn", "score").head
    assert(hit.getLong(0) == 9L && hit.getDouble(1) == 1.0)
  }

  test("an attempt dead between auto-fold and as-of bump leaves no poisoned base") {
    val (cat, wh) = builtCat("veccrashasof", n = 200)
    cat.incrementalMerge("t", rowsDf(Seq(1003L), i => vec(3L)))
    val live = cat.dataVersionOf("t")
    val next = live + 1
    val idxDir = Paths.get(wh, "t.vector.ann")
    // dead attempt's auto-fold renamed data_v(next) (a fold of a patch
    // that never published) but died BEFORE setIndexAsOf — as-of still
    // at `live`, so the as-of-gated healing alone would not fire
    copyDir(idxDir.resolve("data"), idxDir.resolve(s"data_v$next"))
    cat.incrementalMerge("t", rowsDf(Seq(9L), _ => vec(602L)))
    assert(cat.dataVersionOf("t") == next)
    assert(cat.indexStatus("t", "ann", "vector") == "FRESH")
    // rk 9's patch is served — the dead base (which lacks rk 9 and
    // would have masked this attempt's segments) was healed away
    val (view, cent, _) = cat.vectorIndexView("t", "ann")
    val q = rowsDf(Seq(500602L), _ => vec(602L))
    val hit = Ann.ivfSearch(VectorIndex.ivfOf(cent, view), q, "k", "v", k = 1)
      .select("nn", "score").head
    assert(hit.getLong(0) == 9L && hit.getDouble(1) == 1.0)
  }

  test("ADC search over persisted entries prunes its scan to rk+codes") {
    // the 100 TB contract of the PQ path: the encoded-entries scan
    // streams 32×-compressed codes only — the float vectors enter the
    // plan solely through the shortlist re-rank fetch from the base
    // table, never the full-corpus ADC scan
    val (cat, _) = builtCat("vecprune", n = 200)
    val (view, _, meta) = cat.vectorIndexView("t", "ann")
    val q = rowsDf(Seq(500003L), _ => vec(3L))
    val plan = Pq.pqSearch(VectorIndex.pqOf(meta, view),
        cat.table("t").df, q, "k", "v", topK = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rcodes"),
      "plain-PQ ADC scan reads residual codes it never uses")
    val entryScans = plan.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("codes")).toList
    assert(entryScans.nonEmpty, s"no pruned entries scan found in:\n$plan")
    entryScans.foreach(l => assert(!l.contains("v:array"),
      s"the ADC scan reads the float vectors:\n$l"))
  }

  test("the SQL CALL surface drives vector index DDL end-to-end") {
    val (cat, wh) = freshCat("vecsql")
    spark.conf.set("spark.sql.catalog.gvec",
      classOf[graft.kv.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvec.warehouse", wh)
    cat.createTable("t", schema, Seq("k"))
    cat.bulkLoad("t", rowsDf(0L until 200L), partitions = 2)
    spark.sql("CALL gvec.system.create_index('t', 'ann', 'vector', 'v')")
    assert(cat.indexStatus("t", "ann", "vector") == "FRESH")
    cat.incrementalMerge("t", rowsDf(Seq(1003L), i => vec(3L)))
    spark.sql("CALL gvec.system.compact_index('t', 'ann', 'vector')")
    val live = cat.dataVersionOf("t")
    assert(Files.exists(Paths.get(wh, "t.vector.ann", s"data_v$live")))
    val got = top1(cat, "ivf", Seq(3L))
    assert(got(3L)._2 == 1.0)
  }

  test("bulk writes leave the index STALE; refresh_index re-trains to FRESH") {
    val (cat, _) = builtCat("vecstale", n = 200)
    cat.bulkLoad("t", rowsDf(0L until 250L), partitions = 2)
    assert(cat.indexStatus("t", "ann", "vector").startsWith("STALE"))
    cat.refreshIndex("t", "ann", "vector")
    assert(cat.indexStatus("t", "ann", "vector") == "FRESH")
    val (view, _, _) = cat.vectorIndexView("t", "ann")
    assert(view.count() == 250)
    val got = top1(cat, "ivf", Seq(222L))
    assert(got(222L) == (222L, 1.0))
  }
}
