package graft.similarity

import graft.plans.PqExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-quantization ANN (the memory-bound scale path).
  *
  * PQ attacks a different bottleneck than IVF/LSH: instead of pruning
  * candidates, it COMPRESSES them. Each vector is split into `m`
  * subvectors; each subvector is replaced by the id of its nearest
  * centroid from a per-subspace codebook of `k` entries — d float32
  * dims become m small codes (64 floats → 8 bytes here, 32× less).
  * At 100 TB the scored corpus is what streams through the scan, so
  * scan cost is memory-bandwidth-bound and PQ's compression is the
  * win; composing it under an IVF coarse quantizer (scan only probed
  * lists, scored via PQ) is the standard FAISS-style stack — both
  * halves exist here and compose on the same DataFrames.
  *
  * Search is asymmetric-distance (ADC): the query stays full-precision
  * and precomputes a lookup table of its dot product against every
  * (subspace, centroid) pair — m·k dots, once per query — after which
  * scoring a corpus row is m array lookups instead of a d-dim dot.
  * The ADC top-`shortlist` per query is then re-ranked with the exact
  * float cosine (a candidate-id fetch join — |Q|·shortlist rows), so
  * reported scores are exact and the quantization error only affects
  * recall, not precision of the returned scores.
  *
  * Codebook training follows buildIvf's bounded-seeded-sample recipe
  * (Ann.scala): m independent k-means fits on the subvector slices of
  * one cached training sample. Build is the DDL step; the codebook
  * (m·k·dsub floats — bytes, not gigabytes) rides the expression nodes
  * as a codegen reference object, never a shuffle.
  */
object Pq {

  /** L2-normalize an array<float|double> column (zero vectors pass
    * through unchanged). The norm is computed into its OWN column
    * reference before the per-element division — referencing the norm
    * expression inside the transform lambda would re-evaluate the full
    * aggregate per element (O(d²) per vector). Plain-PQ search
    * normalizes train/encode/query so the ADC inner product IS the
    * cosine: without it, a small-norm vector with the highest cosine
    * to q can rank below `shortlist` large-norm vectors on raw dot and
    * never reach the exact re-rank — a recall loss that does not
    * shrink with quantization error. (The FAISS cosine recipe:
    * normalize, then search IP.) The residual IVF×PQ path is L2-metric
    * throughout and does NOT normalize. */
  private[similarity] def withNormalized(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__nrm",
        sqrt(aggregate(col(vecCol).cast("array<double>"),
          lit(0.0), (acc, x) => acc + x * x)))
      .withColumn(vecCol,
        when(col("__nrm") > 0,
          transform(col(vecCol),
            x => (x.cast("double") / col("__nrm")).cast("float")))
          .otherwise(col(vecCol).cast("array<float>")))
      .drop("__nrm")

  /** A built PQ index: codebook dims + the encoded corpus
    * (`encoded`: nn, codes array<int> of length m). Like IvfIndex this
    * is a persisted artifact — built once by DDL, consulted by every
    * search. */
  case class PqIndex(m: Int, k: Int, dsub: Int, codebook: Array[Float],
                     encoded: DataFrame)

  /** Train the codebook and encode the corpus. `embs(vecCol)` must be
    * fixed-dimension array<float|double> with d divisible by m. One
    * `head` (dims) + one `count` (sample sizing) + m bounded k-means
    * fits — all at BUILD time, the same cost contract as buildIvf. */
  def buildPq(embs: DataFrame, idCol: String, vecCol: String,
              m: Int = 8, k: Int = 16, maxIter: Int = 5,
              maxTrain: Int = 50000): PqIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // ONE NULL-filtered frame feeds the dim probe, the sample-fraction
    // count and the training sample. Contract: rows whose vector is
    // NULL encode to NULL codes (nullSafeEval) and are skipped by the
    // ADC scan — unlike ragged vectors, which fail loudly at encode
    // time; an arbitrary unfiltered first row would fail the probe
    // with an opaque NPE, and a sampled NULL row would crash
    // KMeans.fit the same way.
    // cosine-consistent codes: train and encode on L2-normalized
    // vectors (see withNormalized) so ADC's inner product approximates
    // the cosine the re-rank reports
    val nonNull = withNormalized(
      embs.filter(col(vecCol).isNotNull), vecCol)
    val head = nonNull.select(size(col(vecCol))).head(1)
    require(head.nonEmpty,
      s"buildPq: no non-null $vecCol vectors — nothing to train on")
    val d = head(0).getInt(0)
    require(d % m == 0, s"vector dims $d not divisible by m=$m subspaces")
    val dsub = d / m
    // fraction over the NON-NULL count — sizing it over the total row
    // count would silently shrink the training sample in proportion to
    // the NULL share of the corpus
    val n = nonNull.count()
    val fraction = if (n == 0) 1.0 else math.min(1.0, maxTrain * 1.2 / n.toDouble)
    val train = nonNull
      .select(col(vecCol).cast("array<double>").as("v"))
      .sample(withReplacement = false, fraction, seed = 42L)
      .limit(maxTrain).cache()
    val nTrain = train.count()
    // tiny corpora: k-means needs k ≤ training rows; a clamped k only
    // shortens the code range, never breaks the encode/score contract
    val kEff = math.max(1, math.min(k.toLong, nTrain).toInt)
    val codebook = new Array[Float](m * kEff * dsub)
    var s = 0
    while (s < m) {
      val sub = train.select(
        array_to_vector(slice(col("v"), s * dsub + 1, dsub)).as("features"))
      val model = new KMeans().setK(kEff).setSeed(42L + s).setMaxIter(maxIter)
        .setInitMode("random").fit(sub)
      val centers = model.clusterCenters
      var c = 0
      while (c < centers.length) {
        val arr = centers(c).toArray
        var j = 0
        while (j < dsub) {
          codebook(((s * kEff) + c) * dsub + j) = arr(j).toFloat
          j += 1
        }
        c += 1
      }
      s += 1
    }
    train.unpersist()
    // encode the normalized form too (NULL vectors still encode to
    // NULL codes: a NULL norm fails the `> 0` branch and the NULL
    // vector passes through to pqCodes' nullSafeEval)
    val encoded = withNormalized(embs, vecCol).select(col(idCol).as("nn"),
      PqExpressions.pqCodes(col(vecCol), codebook, m, kEff, dsub).as("codes"))
    PqIndex(m, kEff, dsub, codebook, encoded)
  }

  /** ADC search + exact re-rank. `corpus` supplies the float vectors
    * for the re-rank fetch (normally the same table the index was
    * built from). Output contract matches Ann: (qid, rn, nn, score)
    * with score = exact cosine rounded to 3 dp, ties on nn. */
  def pqSearch(idx: PqIndex, corpus: DataFrame, queries: DataFrame,
               idCol: String, vecCol: String, topK: Int,
               shortlist: Int = 32): DataFrame = {
    // query vectors normalize like the encoded corpus: LUT dots are
    // then cosine estimates, the same metric the re-rank reports
    val q = withNormalized(
        queries.select(col(idCol).as("qid"), col(vecCol).as("qv")), "qv")
      .withColumn("lut",
        PqExpressions.pqLut(col("qv"), idx.codebook, idx.m, idx.k, idx.dsub))
    val adcScored = idx.encoded
      .crossJoin(broadcast(q.select(col("qid"), col("lut"))))
      .filter(col("nn") =!= col("qid"))
      .withColumn("adc", PqExpressions.pqAdc(col("codes"), col("lut"), idx.k))
    val cands = graft.plans.TopK.perGroup(
      adcScored.select(col("qid"), col("nn"), col("adc")),
      Seq("qid"), Seq(("adc", true), ("nn", false)), shortlist)
    val vecs = corpus.select(col(idCol).as("nn"), col(vecCol).as("v"))
    val reranked = cands.join(vecs, Seq("nn"))
      .join(broadcast(q.select(col("qid"), col("qv"))), Seq("qid"))
      .withColumn("score",
        round(graft.functions.VectorFunctions.cosine(col("qv"), col("v")), 3))
    Ann.rank(reranked.select(col("qid"), col("nn"), col("score")), topK)
  }

  /** Build + search in one call (tests / one-shot use). */
  def pqTopK(embs: DataFrame, idCol: String, vecCol: String,
             queries: DataFrame, topK: Int, m: Int = 8, k: Int = 16,
             shortlist: Int = 32): DataFrame =
    pqSearch(buildPq(embs, idCol, vecCol, m, k), embs, queries,
      idCol, vecCol, topK, shortlist)

  /** IVF×PQ with RESIDUAL encoding (the FAISS IVFPQ design): the
    * coarse quantizer prunes WHICH rows are scanned (nprobe lists of
    * ~N/√N), PQ compresses WHAT each scanned row costs (m byte-codes
    * instead of d floats) — candidate pruning × memory-bandwidth
    * compression, the standard two-level ANN stack for corpora too
    * large to flat-scan.
    *
    * Residuals: each entry stores PQ codes of (x − c_list), and the
    * codebook is TRAINED on residuals — residual vectors concentrate
    * near 0 regardless of where lists sit in space, so the same k
    * centroids per subspace quantize far more finely than they would
    * raw vectors. Search exploits the exact identity
    * q − x = (q − c_list) − (x − c_list): a per-(query, probed-list)
    * squared-L2 table against the residual query reconstructs
    * ‖q − x‖² up to within-cell quantization error, at m lookups per
    * scanned row.
    *
    * `entries` carries (nn, cluster, codes) — hash-partitionable by
    * cluster at any scale; both codebooks are driver-side floats that
    * ride the expression nodes into codegen. */
  case class IvfPqIndex(centroids: DataFrame, entries: DataFrame, pq: PqIndex)

  /** Returned `entries` is CACHED and already materialized: build is
    * the DDL step, and the residual frame (k-means transform +
    * centroid join + subtraction) feeds dim-probe, sample sizing,
    * codebook training AND encoding — caching it (and the final
    * entries) keeps the build at ~2 corpus passes instead of 4+. */
  def buildIvfPq(embs: DataFrame, idCol: String, vecCol: String,
                 m: Int = 8, k: Int = 16): IvfPqIndex = {
    val ivf = Ann.buildIvf(embs, idCol, vecCol)
    val resid = ivf.assigned
      .join(broadcast(ivf.centroids), Seq("cluster"))
      .withColumn("r", zip_with(col("v"), col("centroid"),
        (x, c) => x.cast("double") - c))
      .cache()
    // trains the codebook on residuals; the raw-vector `encoded` frame
    // inside this PqIndex is unused (entries below carry the codes)
    val pq = buildPq(resid, "nn", "r", m, k)
    val entries = resid.select(col("nn"), col("cluster"),
      PqExpressions.pqCodes(col("r"), pq.codebook, pq.m, pq.k, pq.dsub).as("codes"))
      .cache()
    entries.count() // materialize off the hot residual cache
    resid.unpersist()
    IvfPqIndex(ivf.centroids, entries, pq)
  }

  /** Probe the nprobe nearest lists (same L2 probe metric as
    * ivfSearch), ADC-score their entries against the per-list residual
    * query table (ascending ‖q−x‖²), exact-rerank the shortlist by
    * cosine. */
  def ivfPqSearch(idx: IvfPqIndex, corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String, topK: Int,
                  nprobe: Int = 4, shortlist: Int = 32): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val probes = Ann.coarseProbes(idx.centroids, q, nprobe,
        keep = Seq("qv", "centroid"))
      // one residual L2 table per (query, probed list): m·k small dots,
      // computed on nprobe rows per query — never per corpus row
      .withColumn("lut", PqExpressions.pqLutL2(
        zip_with(col("qv"), col("centroid"), (x, c) => x.cast("double") - c),
        idx.pq.codebook, idx.pq.m, idx.pq.k, idx.pq.dsub))
    val adcScored = idx.entries
      .join(broadcast(probes.select(col("qid"), col("lut"), col("cluster"))), Seq("cluster"))
      .filter(col("nn") =!= col("qid"))
      .withColumn("adcd", PqExpressions.pqAdc(col("codes"), col("lut"), idx.pq.k))
    val cands = graft.plans.TopK.perGroup(
      adcScored.select(col("qid"), col("nn"), col("adcd")),
      Seq("qid"), Seq(("adcd", false), ("nn", false)), shortlist)
    val vecs = corpus.select(col(idCol).as("nn"), col(vecCol).as("v"))
    val reranked = cands.join(vecs, Seq("nn"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("score",
        round(graft.functions.VectorFunctions.cosine(col("qv"), col("v")), 3))
    Ann.rank(reranked.select(col("qid"), col("nn"), col("score")), topK)
  }
}
