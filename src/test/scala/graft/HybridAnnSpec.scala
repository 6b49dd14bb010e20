package graft

import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for ft_hybrid_ann — the index-served hybrid whose
  * vector arm probes the persisted `vector` index instead of scanning
  * the corpus. k-means cells aren't SQL-expressible, so the DuckDB
  * oracle can't gate it; these checks hold the line instead:
  * determinism, lex-arm parity with the exact hybrid, a fused-overlap
  * floor, and the plan shape the operator exists for (the corpus
  * reaches the cosine kernel only through the coarse-quantizer list
  * join — never a corpus-wide cross join). */
class HybridAnnSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ann = SparkEntry.queries("ft_hybrid_ann")(spark, sf)
  private lazy val exact = SparkEntry.queries("ft_hybrid_rrf")(spark, sf)

  test("index-served hybrid is deterministic across runs") {
    val a = ann.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = SparkEntry.queries("ft_hybrid_ann")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("fused output overlaps the exact hybrid's top-20") {
    val a = ann.collect().map(_.getLong(0)).toSet
    val e = exact.collect().map(_.getLong(0)).toSet
    val overlap = a.intersect(e).size
    // measured at sf0.001 (nprobe=8 of ~22 lists); the floor leaves
    // headroom for index re-trains while still failing if the vector
    // arm degrades to noise (expected-by-chance overlap is < 1 doc)
    assert(overlap >= 10, s"fused overlap $overlap/20 vs exact hybrid")
  }

  test("lexical contributions agree between the hybrids") {
    // RRF is a sum of two independent arm terms; docs ranked by the
    // lexical arm in BOTH outputs must carry rrf values that differ
    // only by the vector term, i.e. by less than one full lex step.
    // A doc present in both with rrf differing by >= the max vector
    // contribution (1/61) in OPPOSITE directions would mean the lex
    // arm itself diverged — it is byte-identical code, so pin it.
    val a = ann.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val e = exact.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val shared = a.keySet.intersect(e.keySet)
    assert(shared.nonEmpty)
    shared.foreach { k =>
      assert(math.abs(a(k) - e(k)) <= 1.0 / 61 + 1e-9,
        s"doc $k: ann rrf ${a(k)} vs exact ${e(k)} — lex arm diverged")
    }
  }

  test("corpus reaches the cosine kernel only through the list join") {
    val plan = ann.queryExecution.executedPlan
    // condition-less (nested-loop) joins are allowed ONLY for the
    // bounded sides: the one-row query vector against the √N-row
    // centroid table. A nested-loop join whose output carries the
    // index entry columns (nn/v) or the raw corpus columns would be
    // the corpus-wide cross scan this operator exists to avoid.
    val bnl = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    bnl.foreach { j =>
      val outs = j.output.map(_.name).toSet
      assert(!outs.contains("nn") && !outs.contains("v") &&
        !outs.contains("label"),
        s"corpus-wide cross join in ft_hybrid_ann:\n$j")
    }
    // and the probed entries DO arrive via an equi-join on cluster
    val s = plan.toString
    assert(s.contains("cluster"),
      s"no coarse-quantizer list join found:\n$s")
  }
}
