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
    val d = embs.select(size(col(vecCol))).head.getInt(0)
    require(d % m == 0, s"vector dims $d not divisible by m=$m subspaces")
    val dsub = d / m
    val n = embs.count()
    val fraction = if (n == 0) 1.0 else math.min(1.0, maxTrain * 1.2 / n.toDouble)
    val train = embs.select(col(vecCol).cast("array<double>").as("v"))
      .sample(withReplacement = false, fraction, seed = 42L)
      .limit(maxTrain).cache()
    train.count()
    val codebook = new Array[Float](m * k * dsub)
    var s = 0
    while (s < m) {
      val sub = train.select(
        array_to_vector(slice(col("v"), s * dsub + 1, dsub)).as("features"))
      val model = new KMeans().setK(k).setSeed(42L + s).setMaxIter(maxIter)
        .setInitMode("random").fit(sub)
      val centers = model.clusterCenters
      var c = 0
      while (c < centers.length) {
        val arr = centers(c).toArray
        var j = 0
        while (j < dsub) {
          codebook(((s * k) + c) * dsub + j) = arr(j).toFloat
          j += 1
        }
        c += 1
      }
      s += 1
    }
    train.unpersist()
    val encoded = embs.select(col(idCol).as("nn"),
      PqExpressions.pqCodes(col(vecCol), codebook, m, k, dsub).as("codes"))
    PqIndex(m, k, dsub, codebook, encoded)
  }

  /** ADC search + exact re-rank. `corpus` supplies the float vectors
    * for the re-rank fetch (normally the same table the index was
    * built from). Output contract matches Ann: (qid, rn, nn, score)
    * with score = exact cosine rounded to 3 dp, ties on nn. */
  def pqSearch(idx: PqIndex, corpus: DataFrame, queries: DataFrame,
               idCol: String, vecCol: String, topK: Int,
               shortlist: Int = 32): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
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
}
