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

  test("index-first join order: probe join sits strictly below the label join") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import spark.implicits._
    // the scale contract (KVIndexTable.kt:64-84 applied to vectors —
    // seek the index FIRST, then fetch): the coarse-quantizer list
    // join must restrict the entry set BEFORE the corpus-sized label
    // table joins on. Catalyst keeps inner equi-join chains in
    // declared order without CBO, so a label-first declaration would
    // survive to execution as a corpus-wide entries⋈labels join per
    // query batch — this pins the order in the OPTIMIZED plan for
    // both the constant and the adaptive probe path.
    val e = Tables.embeddings(spark, sf)
    val (view, cent, _) = graft.dedup.DedupQueries.vecIndex(spark, sf)
    val idx = graft.similarity.VectorIndex.ivfOf(
      cent, view.filter($"rk" < Tables.PlantedIdBase))
    val plans = Seq(
      Ann.filteredIvfSearch(idx, e.filter(col("vec_id") < 20),
        "vec_id", "embedding", "label", e, k = 3, nprobe = 16),
      Ann.filteredIvfSearchAdaptive(idx, e.filter(col("vec_id") < 20),
        "vec_id", "embedding", "label", e, k = 3, baseNprobe = 4)
    ).map(_.queryExecution.optimizedPlan)
    plans.foreach { lp =>
      val joins = lp.collect { case j: Join => j }
      def refs(j: Join): Set[String] =
        j.condition.map(_.references.map(_.name).toSet).getOrElse(Set.empty)
      val attrJoins = joins.filter(j => refs(j).contains("attr"))
      val clusterJoins = joins.filter(j => refs(j).contains("cluster"))
      assert(attrJoins.nonEmpty, s"no label join found:\n$lp")
      assert(clusterJoins.nonEmpty, s"no coarse-quantizer list join found:\n$lp")
      // every cluster-keyed probe join is a descendant of a label join
      val probeBelowLabel = clusterJoins.forall(cj =>
        attrJoins.exists(aj => aj.collect {
          case j: Join if j eq cj => j
        }.nonEmpty))
      assert(probeBelowLabel,
        s"probe join is not below the label join — labels join the " +
          s"FULL entry set before the probe restricts it:\n$lp")
      // and no label join hides below a probe join
      clusterJoins.foreach { cj =>
        val labelBelow = cj.collect {
          case j: Join if !(j eq cj) && refs(j).contains("attr") => j
        }
        assert(labelBelow.isEmpty,
          s"label join below the probe join:\n$lp")
      }
    }
  }

  test("adaptive per-label probe holds the recall floor on a SKEWED label") {
    import spark.implicits._
    // 90/10 label skew over a clustered corpus: the frequency-derived
    // budget probes ~ceil(4/0.9)=5 lists for the dominant label and
    // ~ceil(4/0.1)=40 for the rare one — holding the same-label
    // candidate mass, hence the 0.9 recall floor, PER LABEL. A
    // constant budget sized for the average either over-probes the
    // common label or under-recalls the rare one.
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(40)(Array.fill(8)(rnd.nextGaussian()))
    val rows = (0 until 2000).map { i =>
      val c = centers(rnd.nextInt(centers.length))
      val v = c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat)
      val label = if (rnd.nextDouble() < 0.9) 1 else 2
      (i.toLong, v, label)
    }
    val e = rows.toDF("vec_id", "embedding", "label")
      .repartition(4).cache()
    val idx = Ann.buildIvf(e, "vec_id", "embedding")
    val queries = e.filter($"vec_id" < 40).cache()
    val exact = Ann.filteredTopK(e, "vec_id", "embedding", "label", queries, k = 3)
    val approx = Ann.filteredIvfSearchAdaptive(idx, queries, "vec_id",
      "embedding", "label", e, k = 3, baseNprobe = 4)
    val ql = queries.select($"vec_id".as("qid"), $"label".as("qlabel"))
    def byLabel(df: org.apache.spark.sql.DataFrame) =
      df.join(ql, Seq("qid")).select("qlabel", "qid", "nn").collect()
        .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).toSet }
    val exactBy = byLabel(exact)
    val approxBy = byLabel(approx)
    exactBy.foreach { case (label, truth) =>
      val got = approxBy.getOrElse(label, Set.empty)
      val recall = (truth intersect got).size.toDouble / truth.size
      assert(recall >= 0.9,
        f"label $label recall@3 fell to $recall%.3f (floor 0.9) under skew")
      println(f"[filtered-ann-adaptive] label $label recall@3: $recall%.3f")
    }
    e.unpersist(); queries.unpersist()
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
