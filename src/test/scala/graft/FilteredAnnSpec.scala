package graft

import graft.similarity.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for metadata-constrained vector search
  * (Ann.filteredTopK): the constraint must compose BEFORE ranking —
  * the top-k among label=x is NOT the label=x subset of the global
  * top-k, and a post-filtered implementation fails the planted test
  * below. */
class FilteredAnnSpec extends AnyFunSuite {
  import TestSpark._

  test("the filter composes before ranking, not over the global shortlist") {
    import spark.implicits._
    // query q (label 1): the globally nearest vector is b (label 2 —
    // must be excluded); the best same-label neighbor is c, nearly
    // orthogonal. A post-filter of the global top-1 would return
    // nothing; pre-filtering returns c.
    val rows = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1), // q
      (2L, Array(0.99f, 0.14f, 0.0f, 0.0f), 2), // b: global nn, wrong label
      (3L, Array(0.2f, 0.98f, 0.0f, 0.0f), 1), // c: best with label 1
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Ann.filteredTopK(rows, "vec_id", "embedding", "label",
        rows.filter($"vec_id" === 1L), k = 1)
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("nn") == 3L,
      s"expected same-label neighbor 3, got ${got.head}")
  }

  test("filteredTopK == per-label brute force on the real embeddings") {
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 20)
    val got = Ann.filteredTopK(e, "vec_id", "embedding", "label", queries, k = 3)
      .select("qid", "rn", "nn", "score").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val labels = queries.select("label").distinct()
      .collect().map(_.getInt(0))
    val expected = labels.flatMap { l =>
      Ann.bruteTopK(e.filter(col("label") === l), "vec_id", "embedding",
          queries.filter(col("label") === l), k = 3)
        .select("qid", "rn", "nn", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    }.toSet
    assert(got == expected,
      s"filtered ranking diverges from per-label brute force: " +
        s"only-got=${(got diff expected).take(5)} " +
        s"only-exp=${(expected diff got).take(5)}")
  }

  test("index-served filter keeps pre-rank semantics (all lists probed == exact)") {
    import spark.implicits._
    // same planted geometry as the exact-path test: with every list
    // probed, the IVF-served filter must reproduce filteredTopK
    // exactly — the global nn with the wrong label is excluded and
    // the near-orthogonal same-label vector is returned, proving the
    // constraint composes before ranking inside the probe too
    val rows = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (2L, Array(0.99f, 0.14f, 0.0f, 0.0f), 2),
      (3L, Array(0.2f, 0.98f, 0.0f, 0.0f), 1),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val idx = Ann.buildIvf(rows, "vec_id", "embedding")
    val nlists = idx.centroids.count().toInt
    val got = Ann.filteredIvfSearch(idx, rows.filter($"vec_id" === 1L),
        "vec_id", "embedding", "label", rows, k = 1, nprobe = nlists)
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("nn") == 3L,
      s"expected same-label neighbor 3, got ${got.head.toSeq}")
  }

  test("filtered search through the PERSISTED index: no label leaks + recall floor") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val (view, cent, _) = graft.dedup.DedupQueries.vecIndex(spark, sf)
    val idx = graft.similarity.VectorIndex.ivfOf(
      cent, view.filter($"rk" < Tables.PlantedIdBase))
    val queries = e.filter(col("vec_id") < 20)
    // nprobe follows the selectivity rule the operator documents: a
    // uniform L-valued label keeps ~1/L of every probed list, so the
    // filtered search probes L× the unfiltered budget (4 labels ×
    // nprobe 4 = 16) to hold the same same-label candidate mass.
    // Measured sweep on this corpus: 4→0.33, 8→0.58, 12→0.82,
    // 16→0.92 — the rule lands exactly where the gate needs it.
    val got = Ann.filteredIvfSearch(idx, queries, "vec_id", "embedding",
      "label", e, k = 3, nprobe = 16)
    // the constraint holds on every returned row
    val leaked = got
      .join(e.select(col("vec_id").as("qid"), col("label").as("ql")), "qid")
      .join(e.select(col("vec_id").as("nn"), col("label").as("nl")), "nn")
      .filter(col("ql") =!= col("nl")).count()
    assert(leaked == 0L, s"$leaked cross-label neighbors leaked")
    // recall@3 vs the exact filtered ranking, averaged over queries —
    // deterministic (seeded quantizer, fixed corpus), so the floor
    // sits just under the measured 0.917
    val exact = Ann.filteredTopK(e, "vec_id", "embedding", "label", queries, k = 3)
      .select("qid", "nn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = got.select("qid", "nn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9,
      f"recall@3 through the persisted index fell to $recall%.3f (floor 0.9)")
    println(f"[filtered-ann] recall@3 through persisted index: $recall%.3f")
  }

  test("filtered probe: corpus reaches the cosine kernel only through the list join") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val (view, cent, _) = graft.dedup.DedupQueries.vecIndex(spark, sf)
    val idx = graft.similarity.VectorIndex.ivfOf(
      cent, view.filter($"rk" < Tables.PlantedIdBase))
    val res = Ann.filteredIvfSearch(idx, e.filter(col("vec_id") < 20),
      "vec_id", "embedding", "label", e, k = 3, nprobe = 16)
    val plan = res.queryExecution.executedPlan
    // the only condition-less join allowed is the bounded query×
    // centroid probe; entries (nn/v) and labels must arrive via
    // equi-joins — a nested-loop carrying them would be the
    // corpus-wide cross scan the index exists to avoid
    val bnl = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    bnl.foreach { j =>
      val outs = j.output.map(_.name).toSet
      assert(!outs.contains("nn") && !outs.contains("v") &&
        !outs.contains("attr"),
        s"corpus-wide cross join in sim_filtered_ann:\n$j")
    }
    assert(plan.toString.contains("cluster"),
      "no coarse-quantizer list join found")
  }

  test("every returned neighbor carries the query's label") {
    val e = Tables.embeddings(spark, sf)
    val res = Ann.filteredTopK(e, "vec_id", "embedding", "label",
      e.filter(col("vec_id") < 20), k = 3)
    val leaked = res
      .join(e.select(col("vec_id").as("qid"), col("label").as("ql")), "qid")
      .join(e.select(col("vec_id").as("nn"), col("label").as("nl")), "nn")
      .filter(col("ql") =!= col("nl")).count()
    assert(leaked == 0L, s"$leaked cross-label neighbors leaked")
  }
}
