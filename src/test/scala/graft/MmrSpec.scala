package graft

import graft.similarity.Ann
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

/** MMR diversification semantics (sim_mmr's oracle hash-gates the
  * full greedy selection against planted data; this pins the REASON
  * the operator exists on a hand-built corpus): a duplicate of an
  * already-picked result must fall BELOW a less-relevant-but-diverse
  * candidate, which plain top-k ranking would never do. */
class MmrSpec extends AnyFunSuite {
  import TestSpark._

  test("a picked result's duplicate ranks below a diverse candidate") {
    import spark.implicits._
    // q = e1; A (id 10) and its exact duplicate A' (id 11) at rel 0.9;
    // B (id 12) equally relevant but in a different direction —
    // sim(A,B) = 0.81 < sim(A,A') = 1. Greedy λ=0.7: A first (tie →
    // lower id), then B (0.63 − 0.3·0.81 beats 0.63 − 0.3·1.0),
    // duplicate last. Pure relevance ranking gives 10, 11, 12.
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (10L, Seq(0.9f, 0.436f, 0.0f)),
      (11L, Seq(0.9f, 0.436f, 0.0f)),
      (12L, Seq(0.9f, 0.0f, 0.436f))
    ).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 1L)

    val brute = Ann.bruteTopK(corpus, "vec_id", "embedding", queries, k = 3)
      .orderBy("rn").select("nn").as[Long].collect().toSeq
    assert(brute == Seq(10L, 11L, 12L), s"brute baseline moved: $brute")

    val mmr = Ann.mmrTopK(corpus, "vec_id", "embedding", queries,
        shortlist = 10, k = 3, lambda = 0.7)
      .orderBy("rn").select("nn").as[Long].collect().toSeq
    assert(mmr == Seq(10L, 12L, 11L),
      s"MMR did not demote the duplicate: $mmr")
  }

  test("first pick always equals the relevance top-1; picks distinct") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter($"vec_id" < 5)
    val top1 = Ann.bruteTopK(e, "vec_id", "embedding", queries, k = 1)
      .select($"qid", $"nn".as("bn"))
    val m = Ann.mmrTopK(e, "vec_id", "embedding", queries,
      shortlist = 20, k = 5, lambda = 0.7)
    assert(m.filter($"rn" === 1).join(top1, Seq("qid"))
      .filter($"nn" =!= $"bn").count() == 0,
      "rank-1 MMR pick diverged from the relevance top-1")
    val dup = m.groupBy($"qid", $"nn").count().filter($"count" > 1).count()
    assert(dup == 0, "a neighbor was picked twice for one query")
  }

  test("an un-deduplicated corpus cannot emit the same id at two ranks") {
    import spark.implicits._
    // id 10 appears TWICE in the corpus — both rows survive the
    // shortlist as separate candidates; the fold must retire both
    // once either is picked
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (10L, Seq(0.9f, 0.436f, 0.0f)),
      (10L, Seq(0.9f, 0.436f, 0.0f)),
      (12L, Seq(0.9f, 0.0f, 0.436f))
    ).toDF("vec_id", "embedding")
    val m = Ann.mmrTopK(corpus, "vec_id", "embedding",
        corpus.filter($"vec_id" === 1L).limit(1),
        shortlist = 10, k = 3, lambda = 0.7)
      .orderBy("rn").select("nn").as[Long].collect().toSeq
    assert(m == Seq(10L, 12L), s"duplicate id emitted twice: $m")
  }

  test("index-served MMR agrees with ivfSearch at rank 1, stays in the probe set") {
    import spark.implicits._
    // the gate query's own persisted-index shortlist source
    val idx = {
      val (view, cent, _) = graft.dedup.DedupQueries.vecIndex(spark, sf)
      graft.similarity.VectorIndex.ivfOf(cent, view)
    }
    val q = Tables.embeddings(spark, sf).filter($"vec_id" < 5)
    val mmr = Ann.mmrAnnTopK(idx, q, "vec_id", "embedding",
      shortlist = 20, k = 5, lambda = 0.7)
    // rank 1 = the index's relevance top-1 (MMR's first pick is pure
    // relevance over the same probed candidate set)
    val ivf1 = Ann.ivfSearch(idx, q, "vec_id", "embedding", k = 1)
      .select($"qid", $"nn".as("bn"))
    assert(mmr.filter($"rn" === 1).join(ivf1, Seq("qid"))
      .filter($"nn" =!= $"bn").count() == 0,
      "index-served MMR rank-1 diverged from ivfSearch top-1")
    // every pick comes from the index's own top-20 probe shortlist
    val short20 = Ann.ivfSearch(idx, q, "vec_id", "embedding", k = 20)
      .select($"qid", $"nn").withColumn("inshort", lit(1))
    assert(mmr.join(short20, Seq("qid", "nn"), "left")
      .filter($"inshort".isNull).count() == 0,
      "an MMR pick fell outside the probed shortlist")
    val dup = mmr.groupBy($"qid", $"nn").count().filter($"count" > 1).count()
    assert(dup == 0, "a neighbor was picked twice for one query")
  }

  test("both MMR entry points reject a non-integral id at plan time") {
    import spark.implicits._
    // the guard lives in the shared rerank fold, so the exact-scan
    // AND index-served paths both fail with the clear message instead
    // of an opaque encoder error mid-fold
    val embs = Seq(("a", Seq(1.0f, 0.0f)), ("b", Seq(0.0f, 1.0f)))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Ann.mmrTopK(embs, "id", "v", embs, shortlist = 2, k = 1, lambda = 0.7)
    }
    assert(e.getMessage.contains("integral id"), e.getMessage)
    val idx = {
      val (view, cent, _) = graft.dedup.DedupQueries.vecIndex(spark, sf)
      graft.similarity.VectorIndex.ivfOf(cent, view)
    }
    val badQ = Tables.embeddings(spark, sf).filter($"vec_id" < 2)
      .withColumn("vec_id", $"vec_id".cast("string"))
    val e2 = intercept[IllegalArgumentException] {
      Ann.mmrAnnTopK(idx, badQ, "vec_id", "embedding",
        shortlist = 5, k = 2, lambda = 0.7)
    }
    assert(e2.getMessage.contains("integral id"), e2.getMessage)
  }
}
