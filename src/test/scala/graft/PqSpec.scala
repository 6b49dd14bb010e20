package graft

import graft.plans.PqOps
import graft.similarity.{Ann, Pq}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for product-quantization ANN: kernel-level invariants
  * against a hand-computed codebook, plus planted-duplicate recall on
  * the real embeddings (the codebook itself comes from k-means, so
  * there is no SQL oracle — same contract as the LSH/IVF suites). */
class PqSpec extends AnyFunSuite {
  import TestSpark._

  // ---- kernel invariants on a tiny hand-built codebook --------------
  // m=2 subspaces, k=2 centroids, dsub=2:
  //   sub0: c0=(0,0)   c1=(1,1)
  //   sub1: c0=(2,2)   c1=(-1,0)
  private val cb = Array[Float](0, 0, 1, 1, 2, 2, -1, 0)

  private def arr(xs: Double*) = new GenericArrayData(xs.toArray)

  test("pq codes pick the L2-nearest centroid per subspace") {
    val v = arr(0.9, 1.1, -0.5, 0.1) // sub0 → c1, sub1 → c1
    val codes = PqOps.codes(v, cb, 2, 2, 2, isFloat = false)
    assert(codes.toIntArray().toSeq == Seq(1, 1))
    val v2 = arr(0.1, -0.2, 3.0, 1.5) // sub0 → c0, sub1 → c0
    assert(PqOps.codes(v2, cb, 2, 2, 2, isFloat = false).toIntArray().toSeq == Seq(0, 0))
  }

  test("pq codes break L2 ties toward the lower centroid index") {
    val v = arr(0.5, 0.5, 0.5, 1.0) // sub0 equidistant from c0/c1 → c0
    assert(PqOps.codes(v, cb, 2, 2, 2, isFloat = false).getInt(0) == 0)
  }

  test("pq lut holds per-(subspace,centroid) dots and adc sums the coded entries") {
    val q = arr(1.0, 2.0, 3.0, 4.0)
    val lut = PqOps.lut(q, cb, 2, 2, 2, isFloat = false)
    // lut[s*k+c] = dot(q_sub, centroid)
    assert(lut.toDoubleArray().toSeq == Seq(0.0, 3.0, 14.0, -3.0))
    val codes = new GenericArrayData(Array(1, 0))
    assert(PqOps.adc(codes, lut, k = 2) == 3.0 + 14.0)
    // squared-L2 table variant (residual IVF-PQ scoring)
    val lut2 = PqOps.lutL2(q, cb, 2, 2, 2, isFloat = false)
    assert(lut2.toDoubleArray().toSeq == Seq(5.0, 1.0, 5.0, 32.0))
    assert(PqOps.adc(codes, lut2, k = 2) == 1.0 + 5.0)
  }

  // ---- end-to-end on the real embeddings ----------------------------

  test("pq ANN ranks a planted identical vector first with score 1.0") {
    val e = Tables.embeddings(spark, sf)
    val withCopy = e.unionByName(
      e.filter(col("vec_id") === 3L).withColumn("vec_id", lit(1000003L)))
    val top = Pq.pqTopK(withCopy, "vec_id", "embedding",
        withCopy.filter(col("vec_id") === 3L), topK = 1)
      .collect()
    assert(top.length == 1)
    assert(top.head.getAs[Long]("nn") == 1000003L)
    assert(top.head.getAs[Double]("score") == 1.0)
  }

  test("pq shortlist + exact re-rank recalls brute-force neighbors") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val brute = Ann.bruteTopK(e, "vec_id", "embedding", q, k = 1)
      .select("qid", "nn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Pq.pqTopK(e, "vec_id", "embedding", q, topK = 1)
      .select("qid", "nn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((brute intersect pq).size >= 6,
      s"pq recall too low: ${(brute intersect pq).size}/10")
  }

  test("ivf-pq ranks a planted identical vector first and recalls brute-force neighbors") {
    val e = Tables.embeddings(spark, sf)
    val withCopy = e.unionByName(
      e.filter(col("vec_id") === 3L).withColumn("vec_id", lit(1000003L)))
    val idx = Pq.buildIvfPq(withCopy, "vec_id", "embedding")
    val top = Pq.ivfPqSearch(idx, withCopy, withCopy.filter(col("vec_id") === 3L),
        "vec_id", "embedding", topK = 1)
      .collect()
    assert(top.length == 1 && top.head.getAs[Long]("nn") == 1000003L)
    assert(top.head.getAs[Double]("score") == 1.0)
    val q = e.filter(col("vec_id") < 10)
    val brute = Ann.bruteTopK(e, "vec_id", "embedding", q, k = 1)
      .select("qid", "nn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx2 = Pq.buildIvfPq(e, "vec_id", "embedding")
    val ivfpq = Pq.ivfPqSearch(idx2, e, q, "vec_id", "embedding", topK = 1, nprobe = 8)
      .select("qid", "nn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((brute intersect ivfpq).size >= 5,
      s"ivf-pq recall too low: ${(brute intersect ivfpq).size}/10")
  }

  test("a mis-dimensioned vector fails loudly instead of encoding garbage") {
    val short = arr(0.5, 0.5) // codebook needs 4 dims
    val e = intercept[IllegalArgumentException] {
      PqOps.codes(short, cb, 2, 2, 2, isFloat = false)
    }
    assert(e.getMessage.contains("dims"))
    intercept[IllegalArgumentException] {
      PqOps.lut(short, cb, 2, 2, 2, isFloat = false)
    }
    intercept[IllegalArgumentException] {
      PqOps.adc(new GenericArrayData(Array(1, 0)), arr(1.0, 2.0), k = 2)
    }
    // a code outside [0, k) would read another subspace's LUT slot
    intercept[IllegalArgumentException] {
      PqOps.adc(new GenericArrayData(Array(2, 0)), arr(1.0, 2.0, 3.0, 4.0), k = 2)
    }
    // ragged vector pairs in the flat kernels fail loudly too
    intercept[IllegalArgumentException] {
      graft.plans.HashOps.dotInt(
        new GenericArrayData(Array(1, 2)), new GenericArrayData(Array(1, 2, 3)))
    }
    intercept[IllegalArgumentException] {
      graft.plans.HashOps.cosine(arr(1.0, 2.0), arr(1.0, 2.0, 3.0),
        aIsFloat = false, bIsFloat = false)
    }
  }

  test("pq codes compress to m small ints and stay within [0, k)") {
    val e = Tables.embeddings(spark, sf)
    val idx = Pq.buildPq(e, "vec_id", "embedding")
    assert(idx.m == 8 && idx.dsub == 8)
    val bad = idx.encoded
      .filter(size(col("codes")) =!= idx.m ||
        exists(col("codes"), c => c < 0 || c >= idx.k))
      .count()
    assert(bad == 0L)
  }
}
