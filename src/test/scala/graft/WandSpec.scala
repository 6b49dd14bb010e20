package graft

import graft.index.FullText
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Block-max WAND pruning for BM25 ranked top-k: results must be
  * hash-identical to the exhaustive scorer (pruning is invisible),
  * while the pruning bound actually engages — on a skewed corpus the
  * postings SCORED are a strict subset of the postings MATCHED (the
  * whole point of the Lucene-8 block-max structure at 100 TB). */
class WandSpec extends AnyFunSuite {
  import TestSpark._

  /** Skewed synthetic corpus: every doc matches the query terms (so
    * matched postings = corpus-wide), but the high-impact docs
    * concentrate in a few doc-id blocks — short docs stuffed with the
    * query terms — while the long tail mentions them once inside long
    * filler. Block upper bounds then separate and WAND can skip the
    * tail without scoring it. */
  private def skewedDocs = {
    import spark.implicits._
    (0L until 2048L).map { i =>
      val hot = i < 64 // one hot block (blockBits=6 → ids 0..63)
      val text =
        if (hot) "alpha beta alpha beta alpha beta alpha"
        else "alpha beta " + (1 to 40).map(j => s"filler$j w$i").mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
  }

  private def frames(docs: org.apache.spark.sql.DataFrame) = {
    val post = FullText.buildPostings(docs, "doc_id", "text").cache()
    val dict = FullText.buildDictionary(post)
    val dl = FullText.buildDocLens(post)
    val n = docs.count()
    val total = dl.agg(sum("dl")).head.getLong(0)
    (post, dict, dl, n, total.toDouble / n)
  }

  test("WAND top-k equals the exhaustive scorer, row for row") {
    val (post, dict, dl, n, avgdl) = frames(skewedDocs)
    val bm = FullText.buildBlockMax(post, dl, dict, n, avgdl)
    val terms = Seq("alpha", "beta")
    val exact = FullText.bm25TopK(post, dict, dl, n, avgdl, terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val wand = FullText.bm25WandTopK(post, dict, dl, bm, n, avgdl, terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(wand == exact, s"WAND diverged from exhaustive:\n$wand\nvs\n$exact")
  }

  test("pruning engages: postings scored strictly fewer than postings matched") {
    val (post, dict, dl, n, avgdl) = frames(skewedDocs)
    val bm = FullText.buildBlockMax(post, dl, dict, n, avgdl)
    val (_, surviving, matched) = FullText.bm25WandPlan(
      post, dict, dl, bm, n, avgdl, Seq("alpha", "beta"), 20)
    val scored = surviving.count()
    val all = matched.count()
    assert(all == 2L * 2048L, s"every doc should match both terms, got $all")
    assert(scored < all,
      s"WAND scored every matching posting ($scored of $all) — pruning dead")
    // the hot block alone can satisfy k=20; the tail (31 of 32 blocks)
    // should be pruned almost entirely
    assert(scored <= all / 4,
      s"pruning too weak on a fully-skewed corpus: $scored of $all")
  }

  test("no-pruning degenerate cases still return the exact top-k") {
    import spark.implicits._
    // uniform corpus (all blocks tie): nothing can be pruned below the
    // threshold minus the safety margin — results must STILL be exact
    val docs = (0L until 256L).map(i => (i, "alpha beta gamma")).toDF("doc_id", "text")
    val (post, dict, dl, n, avgdl) = frames(docs)
    val bm = FullText.buildBlockMax(post, dl, dict, n, avgdl)
    val exact = FullText.bm25TopK(post, dict, dl, n, avgdl, Seq("alpha"), 10)
      .collect().toSeq
    val wand = FullText.bm25WandTopK(post, dict, dl, bm, n, avgdl, Seq("alpha"), 10)
      .collect().toSeq
    assert(wand == exact)
    // fewer candidates than k: threshold never forms, nothing pruned
    val few = FullText.bm25WandTopK(post, dict, dl, bm, n, avgdl,
      Seq("gamma"), 1000).collect()
    assert(few.length == 256)
  }
}
