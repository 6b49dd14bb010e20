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
    assert(flavors == Set("ivf", "ivfpq", "lsh", "pq"),
      s"expected all four ANN flavors, got $flavors")
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
}
