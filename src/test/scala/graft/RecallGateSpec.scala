package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-visible ANN recall gate: `sim_recall` emits one
  * (flavor, n_queries, n_hits, recall_at_10) row per approximate
  * flavor over the planted exact-copy set, and every flavor must hold
  * recall@10 >= 0.9. An exact copy is the easiest possible neighbor
  * (cosine 1.0), so anything below ~1.0 here means the index
  * structure is broken, not that the corpus is hard — the gate keeps
  * a recall collapse loud in BOTH CORRECTNESS (rows with the actual
  * recall values) and this suite (the pinned threshold). */
class RecallGateSpec extends AnyFunSuite {
  import TestSpark._

  test("sim_recall emits one row per ANN flavor with recall@10 >= 0.9") {
    val rows = SparkEntry.queries("sim_recall")(spark, sf).collect()
    val flavors = rows.map(_.getAs[String]("flavor")).toSet
    assert(flavors == Set("ivf", "ivfpq", "lsh", "pq", "hnsw"),
      s"expected all five ANN flavors, got $flavors")
    rows.foreach { r =>
      val flavor = r.getAs[String]("flavor")
      val n = r.getAs[Long]("n_queries")
      val recall = r.getAs[Double]("recall_at_10")
      assert(n > 0, s"$flavor: empty planted query set")
      assert(recall >= 0.9,
        s"$flavor: recall@10 $recall below the 0.9 gate " +
          s"(${r.getAs[Long]("n_hits")}/$n planted pairs recovered)")
    }
  }

  test("triangle-bound radius search equals brute exactly on both corpus shapes") {
    import graft.similarity.Ann
    import spark.implicits._
    // gate corpus (near-orthogonal — worst case for pruning): the
    // bound may probe wide but the ANSWER must equal the exact scan
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nn"))).toSet
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 10)
    val idx = Ann.buildIvf(e, "vec_id", "embedding")
    assert(pairs(Ann.ivfRadius(idx, q, "vec_id", "embedding", 0.3)) ==
      pairs(Ann.bruteRadius(e, "vec_id", "embedding", q, 0.3)),
      "index-served radius diverged from brute on the gate corpus")
  }

  test("triangle-bound radius probe genuinely prunes a clustered corpus") {
    import graft.similarity.Ann
    import spark.implicits._
    // three tight clusters on the unit sphere, far apart: a high-τ
    // ball stays inside one cluster, so the bound must probe a
    // FRACTION of the lists — this is the 100 TB claim (pruning
    // scales with corpus structure), separated from correctness
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val rows = for {
      c <- centers.indices
      i <- 0 until 60
    } yield ((c * 60 + i).toLong,
      centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f).toSeq)
    val embs = rows.toDF("vec_id", "embedding")
    val idx = Ann.buildIvf(embs, "vec_id", "embedding")
    val nLists = idx.centroids.count()
    assert(nLists >= 6, s"toy corpus built only $nLists lists")
    val q = embs.filter($"vec_id" % 60 === 0) // one query per cluster
    // correctness first: still exactly brute at a tight τ
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nn"))).toSet
    val brute = pairs(Ann.bruteRadius(embs, "vec_id", "embedding", q, 0.95))
    assert(brute.nonEmpty, "tight clusters should contain τ=0.95 neighbors")
    assert(pairs(Ann.ivfRadius(idx, q, "vec_id", "embedding", 0.95)) == brute,
      "index-served radius diverged from brute on the clustered corpus")
    // then pruning: probed (query, list) pairs ≪ queries × lists
    val probed = Ann.radiusProbes(idx,
      q.select($"vec_id".as("qid"), $"embedding".as("qv")), 0.95).count()
    val all = q.count() * nLists
    assert(probed * 2 < all,
      s"τ=0.95 on tight clusters probed $probed of $all (no pruning)")
  }
}
