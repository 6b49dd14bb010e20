package graft.similarity

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md §2
  * "similarity search").
  *
  * Two paths, same contract:
  *  - `bruteTopK`: exact cosine top-k, O(|Q|·N). The query set is
  *    broadcast; the corpus streams through codegen'd vector math —
  *    the right baseline when |Q| is small, at any corpus size.
  *  - `lshTopK`: hyperplane-LSH bucketed ANN — the 100 TB path.
  *    Corpus is hash-partitioned by bucket; a query only scans its
  *    own bucket (candidate set ~ N/2^bits), trading recall for a
  *    2^bits scan reduction. Recall for near-identical vectors is ~1
  *    (they share all sign bits).
  *
  * Scores are rounded to 3 dp before ranking so rankings reproduce
  * bit-for-bit across engines (float32 vs float64 ~1e-8 noise);
  * ties break on neighbor id.
  */
object Ann {

  def bruteTopK(embs: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val scored = embs.select(col(idCol).as("nn"), col(vecCol).as("v"))
      .crossJoin(broadcast(q))
      .filter(col("nn") =!= col("qid"))
      .withColumn("score", round(cosine(col("qv"), col("v")), 3))
    rank(scored, k)
  }

  /** Bounded-heap reduction (graft.plans.TopKPerGroup) first — never
    * window-sorts the full scored set — then a row_number over the
    * ≤k survivors per query for the rank column. */
  private def rank(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    val reduced = graft.plans.TopK.perGroup(
      scored.select(col("qid"), col("nn"), col("score")),
      Seq("qid"), Seq(("score", true), ("nn", false)), k)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nn"))
    reduced.withColumn("rn", row_number().over(w))
      .select(col("qid"), col("rn"), col("nn"), col("score"))
  }

  def lshTopK(embs: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, k: Int, bits: Int = 12): DataFrame = {
    val corpus = embs.select(col(idCol).as("nn"), col(vecCol).as("v"),
      graft.plans.HashExpressions.lshBucket(col(vecCol), bits).as("bucket"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      graft.plans.HashExpressions.lshBucket(col(vecCol), bits).as("bucket"))
    val scored = corpus.join(broadcast(q), Seq("bucket"))
      .filter(col("nn") =!= col("qid"))
      .withColumn("score", round(cosine(col("qv"), col("v")), 3))
    rank(scored, k)
  }
}
