package graft.similarity

import graft.plans.PqExpressions
import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Build/encode/serve kernels for the catalog's persisted `vector`
  * index flavor (Catalog.createIndex type "vector").
  *
  * The reference persists every index as its own table — KV index
  * tables (reference: KVIndexTable.kt:26-44) and the Lucene full-text
  * directory (reference: index/lucene/LuceneIndexTable.kt,
  * HBaseDirectory.kt). The ANN surface here gets the same contract:
  * one DDL build persists
  *   - `cent`:  the IVF coarse-quantizer centroid table
  *     (cluster, centroid) — ~√N rows, broadcastable,
  *   - `vmeta`: one row of PQ geometry + both codebooks (plain +
  *     residual) — driver-side kilobytes that ride expression nodes
  *     into codegen at search time,
  *   - `data`:  per-row entries (rk, cluster, v, codes, rcodes),
  *     cluster-sorted so an IVF probe's list scan prunes row groups,
  * and every search (IVF / PQ-ADC / IVF×PQ) runs against those frames
  * instead of a per-process rebuild. CDC merges keep the index FRESH
  * by appending patch-sized segments encoded against the EXISTING
  * centroids/codebooks (Catalog.maintainAnalyticIndexes); compaction
  * re-trains from the folded entries — the standard IVF maintenance
  * split (cheap assign-on-write, periodic re-train) at any corpus
  * scale.
  *
  * Assignment here uses the same negL2 coarse metric as every
  * IVF-family SEARCH probe (Ann.coarseProbes), for base build and
  * patch encode alike — an exact copy of an indexed vector therefore
  * lands in (and probes) the same primary list by construction,
  * whether it arrived in the backfill or through a CDC patch.
  */
object VectorIndex {

  /** Driver-side geometry + codebooks of a built vector index.
    * `cbPlain` quantizes L2-normalized vectors (ADC inner product ≈
    * cosine — the plain-PQ search contract); `cbResid` quantizes raw
    * residuals (x − c_list) for the IVF×PQ L2 path. */
  final case class VMeta(m: Int, k: Int, dsub: Int,
                         cbPlain: Array[Float], cbResid: Array[Float])

  /** A built index: centroids (cluster, centroid), entries
    * (rk, cluster, v, codes, rcodes), meta. `release()` unpersists the
    * cached assignment frame the build reuses across its fit and
    * encode passes — call it once `entries` has been written. */
  final case class Built(centroids: DataFrame, entries: DataFrame,
                         meta: VMeta, release: () => Unit = () => ())

  /** Train centroids + both codebooks from `rows`, then encode every
    * row through the SAME kernel CDC patches use ([[encodeEntries]]).
    * Three bounded-seeded-sample trainings (1 coarse k-means + 2×m
    * subspace fits), then one encode pass over the corpus — the DDL
    * step; searches never re-fit. */
  def build(rows: DataFrame, rkCol: String, vecCol: String): Built = {
    val ivf = Ann.buildIvf(rows, rkCol, vecCol)
    // codebooks only — the lazy `assigned`/`encoded` frames inside
    // these builders are never materialized here; encodeAssigned below
    // is the single encode pass. The assignment join (corpus ×
    // centroids coarse probe) is CACHED across its consumers — the
    // residual codebook fit's sampling actions and the caller's
    // entries write would otherwise each recompute it.
    val cbPlain = Pq.buildPq(rows, rkCol, vecCol)
    val assigned = assignResid(rows, rkCol, vecCol, ivf.centroids).cache()
    val cbResid = Pq.buildPq(assigned.select(col("rk"), col("r")), "rk", "r")
    // both fits see the same non-null row count and dimension, so the
    // geometries agree; a mismatch would silently mis-decode codes
    require(cbResid.m == cbPlain.m && cbResid.k == cbPlain.k &&
      cbResid.dsub == cbPlain.dsub,
      s"vector-index codebook geometry mismatch: plain " +
        s"(${cbPlain.m},${cbPlain.k},${cbPlain.dsub}) vs residual " +
        s"(${cbResid.m},${cbResid.k},${cbResid.dsub})")
    val meta = VMeta(cbPlain.m, cbPlain.k, cbPlain.dsub,
      cbPlain.codebook, cbResid.codebook)
    Built(ivf.centroids, encodeAssigned(assigned, meta), meta,
      () => { assigned.unpersist(); () })
  }

  /** Encode a (patch) frame against EXISTING centroids + codebooks —
    * the CDC-segment kernel: nearest-centroid assignment by the search
    * probe metric, plain codes of the normalized vector, residual
    * codes of (v − centroid). Cost ∝ patch rows × (|centroids| + m·k),
    * never corpus-sized. */
  def encodeEntries(patch: DataFrame, rkCol: String, vecCol: String,
                    centroids: DataFrame, meta: VMeta): DataFrame =
    encodeAssigned(assignResid(patch, rkCol, vecCol, centroids), meta)

  /** (rk, v, cluster, r): nearest centroid by negL2 + the residual. */
  private def assignResid(rows: DataFrame, rkCol: String, vecCol: String,
                          centroids: DataFrame): DataFrame =
    Ann.coarseProbes(centroids,
        rows.select(col(rkCol).as("qid"), col(vecCol).as("qv")),
        nprobe = 1, keep = Seq("qv", "centroid"))
      .withColumn("r", zip_with(col("qv"), col("centroid"),
        (x, c) => x.cast("double") - c))
      .select(col("qid").as("rk"), col("qv").as("v"), col("cluster"), col("r"))

  private def encodeAssigned(assigned: DataFrame, meta: VMeta): DataFrame =
    Pq.withNormalized(assigned.withColumn("nv", col("v")), "nv")
      .select(col("rk"), col("cluster"), col("v"),
        PqExpressions.pqCodes(col("nv"), meta.cbPlain,
          meta.m, meta.k, meta.dsub).as("codes"),
        PqExpressions.pqCodes(col("r"), meta.cbResid,
          meta.m, meta.k, meta.dsub).as("rcodes"))

  // ---------------- persistence of the driver-side meta ----------------

  def metaFrame(spark: SparkSession, meta: VMeta): DataFrame = {
    val schema = StructType(Seq(
      StructField("m", IntegerType, false),
      StructField("k", IntegerType, false),
      StructField("dsub", IntegerType, false),
      StructField("cb_plain", ArrayType(FloatType, false), false),
      StructField("cb_resid", ArrayType(FloatType, false), false)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(meta.m, meta.k, meta.dsub,
        meta.cbPlain.toSeq, meta.cbResid.toSeq)), schema)
  }

  def metaOf(frame: DataFrame): VMeta = {
    val r = frame.head
    VMeta(r.getInt(0), r.getInt(1), r.getInt(2),
      r.getSeq[Float](3).toArray, r.getSeq[Float](4).toArray)
  }

  // ---------------- search-facing assemblies ----------------

  /** The IVF view over persisted entries (the segmented read view —
    * base + CDC segments − tombstones). */
  def ivfOf(centroids: DataFrame, entries: DataFrame): Ann.IvfIndex =
    Ann.IvfIndex(
      entries.select(col("rk").as("nn"), col("v"), col("cluster")), centroids)

  /** The plain-PQ (ADC-over-cosine) view. */
  def pqOf(meta: VMeta, entries: DataFrame): Pq.PqIndex =
    Pq.PqIndex(meta.m, meta.k, meta.dsub, meta.cbPlain,
      entries.select(col("rk").as("nn"), col("codes")))

  /** The IVF×PQ (residual-ADC) view. The inner PqIndex carries the
    * residual codebook; its `encoded` member is unused by ivfPqSearch
    * (entries carry the codes) and points at the same frame. */
  def ivfPqOf(meta: VMeta, centroids: DataFrame,
              entries: DataFrame): Pq.IvfPqIndex = {
    val e = entries.select(col("rk").as("nn"), col("cluster"),
      col("rcodes").as("codes"))
    Pq.IvfPqIndex(centroids, e,
      Pq.PqIndex(meta.m, meta.k, meta.dsub, meta.cbResid,
        e.select(col("nn"), col("codes"))))
  }
}
