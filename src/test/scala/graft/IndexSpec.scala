package graft

import graft.index.{Bitmap, BitmapIndex, FullText, KvIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IndexSpec extends AnyFunSuite {
  import TestSpark._

  test("bitmap core ops: set/ids/and/or/cardinality round-trip") {
    val a = new Bitmap.Chunks()
    Seq(0L, 1L, 63L, 64L, 65535L, 65536L, 1000000L).foreach(Bitmap.set(a, _))
    val sa = Bitmap.serialize(a)
    assert(Bitmap.ids(sa).toSeq == Seq(0L, 1L, 63L, 64L, 65535L, 65536L, 1000000L))
    assert(Bitmap.cardinality(sa) == 7)

    val b = new Bitmap.Chunks()
    Seq(1L, 64L, 5000000L).foreach(Bitmap.set(b, _))
    val sb = Bitmap.serialize(b)
    assert(Bitmap.ids(Bitmap.and(sa, sb)).toSeq == Seq(1L, 64L))
    assert(Bitmap.cardinality(Bitmap.or(sa, sb)) == 8)
  }

  test("bitmap index matches a plain filter") {
    val o = Tables.orders(spark, sf)
    val idx = BitmapIndex.build(o, "o_orderkey", "o_orderstatus")
    val viaIndex = BitmapIndex.lookupIds(idx, "F").collect().map(_.getLong(0)).sorted
    val direct = o.filter(col("o_orderstatus") === "F")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(viaIndex.sameElements(direct))
  }

  test("bitmap negation matches <> semantics, NULL-valued rows excluded") {
    import spark.implicits._
    // NULL-valued rows never enter any value's bitmap, so they are
    // absent from the existence universe too — exactly what SQL's
    // `col <> v` excludes; the shard where 'b' has no bitmap must
    // pass its whole universe through
    val base = Seq[(Long, String)]((1L, "a"), (2L, "b"), (3L, "a"),
        (40L * 1024 * 1024, "a"), (41L * 1024 * 1024, "c"))
      .toDF("k", "v")
      .unionByName(Seq(5L).toDF("k").withColumn("v",
        org.apache.spark.sql.functions.lit(null: String)))
    val idx = BitmapIndex.build(base, "k", "v")
    val got = BitmapIndex.notIds(idx, "b").collect().map(_.getLong(0)).sorted
    val want = base.filter(col("v") =!= "b")
      .select("k").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), s"${got.toSeq} vs ${want.toSeq}")
  }

  test("hot values shard across id-ranges; AND/OR zip per shard") {
    import spark.implicits._
    // ids straddling three 16Mi-id shards, two values
    val base = Seq(
      (1L, "hot"), (2L, "hot"), (40L * 1024 * 1024, "hot"),
      (80L * 1024 * 1024, "hot"), (2L, "cold"), (80L * 1024 * 1024, "cold"))
      .toDF("k", "v")
    val idx = BitmapIndex.build(base, "k", "v").cache()
    // one row per (value, shard): hot spans 3 shards, never one cell
    assert(idx.filter(col("iv") === "hot").count() == 3)
    val hotIds = BitmapIndex.lookupIds(idx, "hot")
      .collect().map(_.getLong(0)).sorted
    assert(hotIds.sameElements(
      Array(1L, 2L, 40L * 1024 * 1024, 80L * 1024 * 1024)))
    val both = BitmapIndex.combineIds(idx, "hot", idx, "cold", "and")
      .collect().map(_.getLong(0)).sorted
    assert(both.sameElements(Array(2L, 80L * 1024 * 1024)))
    val any = BitmapIndex.combineIds(idx, "hot", idx, "cold", "or")
      .collect().map(_.getLong(0)).sorted
    assert(any.sameElements(hotIds))
    idx.unpersist()
  }

  test("kv index lookup matches a plain filter") {
    val c = Tables.customer(spark, sf)
    val idx = KvIndex.build(c, "c_custkey", "c_nationkey")
    val viaIndex = KvIndex.lookup(c, "c_custkey", idx, 3)
      .select("c_custkey").collect().map(_.getLong(0)).sorted
    val direct = c.filter(col("c_nationkey") === 3)
      .select("c_custkey").collect().map(_.getLong(0)).sorted
    assert(viaIndex.nonEmpty && viaIndex.sameElements(direct))
  }

  test("full-text AND is the intersection of single-term searches") {
    val docs = Tables.documents(spark, sf)
    val postings = FullText.buildPostings(docs, "doc_id", "text").cache()
    val both = FullText.searchAll(docs, "doc_id", postings, Seq("spark", "join"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sparkOnly = FullText.searchAll(docs, "doc_id", postings, Seq("spark"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val joinOnly = FullText.searchAll(docs, "doc_id", postings, Seq("join"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(both == (sparkOnly intersect joinOnly))
    val any = FullText.searchAny(docs, "doc_id", postings, Seq("spark", "join"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(any == (sparkOnly union joinOnly))
    postings.unpersist()
  }

  test("search terms normalize like the index (case) and reject empty lists") {
    val docs = Tables.documents(spark, sf)
    val postings = FullText.buildPostings(docs, "doc_id", "text").cache()
    // the index lowercases; the query side must too, in every flavor
    val lower = FullText.searchAll(docs, "doc_id", postings, Seq("spark"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val upper = FullText.searchAll(docs, "doc_id", postings, Seq("SPARK"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lower.nonEmpty && upper == lower)
    val anyUpper = FullText.searchAny(docs, "doc_id", postings, Seq("Spark"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(anyUpper == lower)
    intercept[IllegalArgumentException](
      FullText.searchAll(docs, "doc_id", postings, Seq.empty))
    intercept[IllegalArgumentException](
      FullText.searchAny(docs, "doc_id", postings, Seq.empty))
    postings.unpersist()
  }

  test("upsertWithIndex collapses duplicate patch keys to one winner") {
    import spark.implicits._
    val base = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val idx = KvIndex.build(base, "k", "v")
    val patch = Seq((1L, "a"), (1L, "b"), (3L, "c")).toDF("k", "v")
    val (newBase, newIndex) = KvIndex.upsertWithIndex(base, "k", "v", idx, patch)
    val baseRows = newBase.collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
    // last-writer-wins per key, deterministic winner = max(non-key cols)
    assert(baseRows == Set((1L, "b"), (2L, "y"), (3L, "c")))
    val idxRows = newIndex.collect()
      .map(r => (r.getAs[String]("ik"), r.getAs[Long]("rk"))).toSet
    assert(idxRows == Set(("b", 1L), ("y", 2L), ("c", 3L)))
  }

  test("tfidf ranks a doc with more query-term hits first") {
    val docs = Tables.documents(spark, sf)
    val postings = FullText.buildPostings(docs, "doc_id", "text")
    val dict = FullText.buildDictionary(postings)
    val top = FullText.tfidfTopK(postings, dict, docs.count(), Seq("spark"), 5).collect()
    assert(top.length == 5)
    assert(top.sliding(2).forall(p => p(0).getDouble(1) >= p(1).getDouble(1)))
  }

  test("bm25 matches the closed form and length-normalizes") {
    import spark.implicits._
    // planted corpus: docs 1 and 2 have IDENTICAL query-term tf (one
    // 'spark') but doc 2 is longer — BM25's length normalization must
    // rank doc 1 above doc 2 (raw tf-idf would tie them); doc 3 has no
    // query term and must not appear
    val docs = Seq(
      (1L, "spark engine"),
      (2L, "spark engine with a very long trailing tail of words here"),
      (3L, "nothing relevant at all")).toDF("doc_id", "text")
    val postings = FullText.buildPostings(docs, "doc_id", "text")
    val dict = FullText.buildDictionary(postings)
    val doclens = FullText.buildDocLens(postings)
    val n = 3L
    val dls = doclens.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val avgdl = dls.values.sum.toDouble / n
    val top = FullText.bm25TopK(postings, dict, doclens, n, avgdl,
      Seq("spark"), 10).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(top(0).getDouble(1) > top(1).getDouble(1))
    // closed-form check for doc 1: tf=1, df=2, dl=2
    val idf = math.log(1.0 + (3.0 - 2 + 0.5) / (2 + 0.5))
    val expected = idf * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * dls(1L) / avgdl))
    assert(math.abs(top(0).getDouble(1) - BigDecimal(expected)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    intercept[IllegalArgumentException](
      FullText.bm25TopK(postings, dict, doclens, 0L, 0.0, Seq("spark"), 10))
  }

  test("dl-carrying build pipeline equals the two-frame builders, both analyzers") {
    // the backfill/refresh paths now derive positional/postings/norms/
    // block stats from ONE dl-carrying pass (no postings⋈doclens
    // join); this pins frame-for-frame equality with the original
    // two-frame builders on a real corpus slice, under BOTH analyzers
    // (english exercises the stopword-filtered dl and the
    // original-offset positions)
    val docs = Tables.documents(spark, sf).limit(120)
    for (an <- Seq("standard", "english")) {
      val posDl = FullText.buildPositionalWithDl(docs, "doc_id", "text", an)
      val postingsDl = FullText.postingsWithDl(posDl)
      // positional: identical rows (original offsets kept)
      val posOld = FullText.buildPositional(docs, "doc_id", "text", an)
      assert(posDl.select("doc_id", "term", "pos").exceptAll(posOld).isEmpty &&
        posOld.exceptAll(posDl.select("doc_id", "term", "pos")).isEmpty,
        s"positional divergence under $an")
      // postings: identical (term, doc, tf)
      val postOld = FullText.postingsFromPositional(posOld)
      assert(postingsDl.select("term", "doc_id", "tf").exceptAll(postOld).isEmpty &&
        postOld.exceptAll(postingsDl.select("term", "doc_id", "tf")).isEmpty,
        s"postings divergence under $an")
      // norms: carried dl == summed tf per doc
      val dlOld = FullText.buildDocLens(postOld)
      val dlNew = FullText.doclensFromPostings(postingsDl)
      assert(dlNew.exceptAll(dlOld).isEmpty && dlOld.exceptAll(dlNew).isEmpty,
        s"doclens divergence under $an")
      // block stats: join-free == join-based
      val bsOld = FullText.buildBlockStats(postOld, dlOld)
      val bsNew = FullText.buildBlockStatsWithDl(postingsDl)
      assert(bsNew.exceptAll(bsOld).isEmpty && bsOld.exceptAll(bsNew).isEmpty,
        s"block-stats divergence under $an")
    }
  }

  test("editDistance matches Spark's levenshtein on corpus term pairs") {
    import spark.implicits._
    // the driver-side fuzzy kernel must agree with the Spark
    // function's distance for every (dictionary term, probe) pair it
    // will ever verify — sample real vocabulary against fixed probes
    val terms = FullText.buildDictionary(
        FullText.buildPostings(Tables.documents(spark, sf).limit(80),
          "doc_id", "text"))
      .select($"term").as[String].collect().take(300)
    val probes = Seq("spark", "graff", "vectr", "streamings", "a", "")
    val pairs = terms.flatMap(t => probes.map(p => (t, p))).toSeq
    val viaSpark = pairs.toDF("a", "b")
      .select(levenshtein($"a", $"b")).as[Int].collect()
    pairs.zip(viaSpark).foreach { case ((a, b), d) =>
      assert(FullText.editDistance(a, b) == d,
        s"editDistance('$a','$b') != Spark levenshtein $d")
    }
  }
}
