package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge-table LEARNING (Sennrich, Haddow & Birch 2015,
  * arXiv:1508.07909 §3.2) — the training counterpart of the
  * [[BpeVocab]] application kernel. The reference ships tokenizer
  * artifacts and never trains one in-engine (its text surface stops
  * at Lucene analysis — see RefAnalyzers in the reference tree), but
  * a training-data pipeline needs the trainer next to the applier:
  * mixture budgets are denominated in subword tokens of a vocabulary
  * trained ON the corpus being mixed.
  *
  * Scale shape (the part Spark owns): classic BPE training never
  * iterates over the corpus — it iterates over the WORD-FREQUENCY
  * table (Sennrich's `vocab`), which is bounded by the distinct-word
  * count, not the corpus size. So the distributed step is exactly one
  * map-side-combining shuffle (tokenize → explode → count), followed
  * by a frequency-truncation to the top `maxWords` words — the
  * standard trainer cap (SentencePiece/HuggingFace both bound the
  * candidate table) — which a TakeOrdered brings to the driver as a
  * bounded set, the same contract as the ANN quantizer's ≤maxTrain
  * sample. The merge loop then runs driver-side over ≤maxWords rows:
  * at 100 TB the corpus never moves, only the word histogram does.
  *
  * Determinism: counts are exact longs; each round merges the
  * most-frequent adjacent pair with ties broken lexicographically,
  * so the learned table is a pure function of the word histogram —
  * independent of row order, partitioning, and engine scheduling
  * (BpeTrainSpec pins distributed == single-JVM on the same text).
  */
object BpeTrain {

  /** Learn `numMerges` merges from a word-frequency table. Word order
    * is irrelevant (pair counts are summed over the whole table and
    * ties break on the pair itself); stops early when no adjacent
    * pair is left. Shared by [[BpeOps.merges]] (seed-trained default)
    * and [[learnDistributed]] (corpus-trained). */
  def learn(wordFreq: Iterable[(String, Long)], numMerges: Int): Vector[(String, String)] = {
    var table: Vector[(Vector[String], Long)] = wordFreq.iterator.map {
      case (w, f) => (w.map(_.toString).toVector, f)
    }.toVector
    val out = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      table.foreach { case (syms, f) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count, ties broken lexicographically — deterministic
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        val joined = best._1 + best._2
        table = table.map { case (syms, f) =>
          val nb = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
              nb += joined; j += 2
            } else { nb += syms(j); j += 1 }
          }
          (nb.result(), f)
        }
        m += 1
      }
    }
    out.result()
  }

  /** Distributed trainer: ONE shuffle builds the word histogram
    * (tokenize → explode → count, partial aggregation map-side), the
    * top `maxWords` by (frequency desc, word) — a TakeOrdered, never
    * a full sort — bound the driver-side merge loop. The truncation
    * is itself deterministic (total tie-break order), so the learned
    * table is reproducible run to run and partitioning to
    * partitioning. */
  def learnDistributed(docs: DataFrame, textCol: Column, numMerges: Int,
                       maxWords: Int = 1 << 16): Vector[(String, String)] = {
    val wf = docs
      .select(explode(HashExpressions.tokens(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    learn(wf, numMerges)
  }
}
